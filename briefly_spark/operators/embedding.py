"""Embedding operators — SURVEY §2.9 M3 (sentence embedding) with the
deterministic-stub / real-backend seam, plus the A5 mean-pool.

The reference embeds chunk batches with a per-process SentenceTransformer
singleton (embedding_utils.py:26-92).  Spark-first, that becomes:

- a **native hash-embedding stub** (:func:`hash_embed_expr`) — pure Column
  expression, used by correctness tests and oracles.  Values are dyadic
  rationals (k/65536 − ½) so sums/means are exact and order-independent in
  any engine.
- an **Arrow-batched harness** (:func:`embed_map_in_pandas`) — the real
  plumbing (mapInPandas, per-executor model singleton, batch shape) with
  two backends: ``hash`` (same function as the stub, byte-identical — so
  the harness itself is oracle-checkable) and ``model`` (loads a
  sentence-transformers model per executor; import-gated since model libs
  aren't in this container).
- **mean-pool** lives in :func:`briefly_spark.functions.vectors.mean_pool`.

At scale: the hash path is codegen map-only; the model path is one
mapInPandas stage whose parallelism is the partition count — batch size is
controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``, exactly
replacing the reference's hand-rolled batching (batch 8, ≤2 concurrent).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"
DEFAULT_DIMS = 16


def hash_embed_expr(col: Column, dims: int = DEFAULT_DIMS) -> Column:
    """Deterministic stub embedding, fully native: dim d of text t is
    ``int(md5(t+':'+d)[:4], 16) / 65536 − 0.5`` — a dyadic rational in
    [−0.5, 0.5), byte-identical in Spark, DuckDB and Python."""
    def dim_val(d: Column) -> Column:
        h = F.md5(F.concat(col, F.lit(":"), d.cast("string")))
        def nib(j: int) -> Column:
            return F.instr(F.lit(HEX), F.substring(h, j, 1)) - 1
        scaled = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
        return scaled / F.lit(65536.0) - F.lit(0.5)

    return F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), dim_val)


def hash_embed_py(text: str, dims: int = DEFAULT_DIMS) -> list[float]:
    """Python twin of :func:`hash_embed_expr` (bit-identical output)."""
    out = []
    for d in range(dims):
        h = hashlib.md5(f"{text}:{d}".encode()).hexdigest()
        out.append(int(h[:4], 16) / 65536.0 - 0.5)
    return out


# ---------------------------------------------------------------------------
# Arrow-batched harness with per-executor backend singleton
# ---------------------------------------------------------------------------
_BACKEND_CACHE: dict[str, Callable[[list[str]], list[list[float]]]] = {}


def _load_backend(name: str, dims: int) -> Callable[[list[str]], list[list[float]]]:
    """Per-executor-process backend singleton (the reference's singleton
    embedder pattern, embedding_utils.py:17-23, without globals juggling:
    this module is imported once per Python worker)."""
    key = f"{name}:{dims}"
    if key in _BACKEND_CACHE:
        return _BACKEND_CACHE[key]
    if name == "hash":
        def fn(texts: list[str]) -> list[list[float]]:
            return [hash_embed_py(t, dims) for t in texts]
    elif name == "model":
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as exc:  # pragma: no cover - model libs not shipped
            raise NotImplementedError(
                "model backend needs sentence-transformers on executors; "
                "use backend='hash' for deterministic tests"
            ) from exc
        model = SentenceTransformer("dangvantuan/vietnamese-embedding")  # pragma: no cover

        def fn(texts: list[str]) -> list[list[float]]:  # pragma: no cover
            return [list(map(float, v)) for v in model.encode(texts, batch_size=8)]
    else:
        raise ValueError(f"unknown embedding backend {name!r}")
    _BACKEND_CACHE[key] = fn
    return fn


def embed_map_in_pandas(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    dims: int = DEFAULT_DIMS,
    backend: str = "hash",
) -> DataFrame:
    """Arrow-batched embedding: (id, text) → (id, vector).  One mapInPandas
    stage; the backend singleton is resolved once per executor process and
    reused across batches.  With ``backend='hash'`` the output is
    byte-identical to :func:`hash_embed_expr`, which is how the plumbing
    itself stays under the correctness oracle."""
    import pandas as pd

    out_schema = f"`{id_col}` long, vector array<double>"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = _load_backend(backend, dims)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "vector": fn(list(pdf[text_col]))}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
