"""Text chunking (SURVEY §2.9 M1/M2) — 1 row → N chunk rows.

Two implementations behind one exploded-output contract:

- :func:`chunk_text` — separator-aware recursive splitter with character
  budget + overlap and a token-count re-split pass, reproducing the
  reference's observable contract (utils/embedding/chunk_splitter.py:14-64:
  separators ``". " "!" "?" "\\n\\n"``, chunk 400 / overlap 50, re-split
  above ``max_tokens`` to 0.75·max with 25-token overlap, drop chunks
  ≤ 10 chars).  Independent implementation of the public
  recursive-character-splitting algorithm — no reference code reused.
  Runs as an Arrow-batched pandas UDF (irreducibly imperative).

- :func:`chunk_fixed_expr` — fixed sliding character window as a *native*
  Column expression (sequence → transform → substring): the
  whole-stage-codegen scale path when separator awareness isn't required,
  and the variant the DuckDB oracle can mirror exactly.

Vietnamese word segmentation (M2, pyvi) is an optional pre-pass: gated
behind an import-try; identity when the library is absent (this container).

Scale: chunking is embarrassingly parallel (mapInPandas over the documents
partitioning, no shuffle); the explode multiplies rows ~(len/350)× which is
accounted for by repartitioning AFTER explode when a downstream shuffle
exists.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SEPARATORS = (". ", "!", "?", "\n\n")
CHUNK_SIZE = 400
CHUNK_OVERLAP = 50
MAX_TOKENS = 2048
TOKEN_OVERLAP = 25
MIN_CHUNK_CHARS = 10


def _whitespace_tokens(s: str) -> int:
    return len(s.split())


def vi_segment(text: str) -> str:
    """Vietnamese word segmentation (M2).  pyvi isn't installed in this
    container; identity fallback keeps the operator total."""
    try:
        from pyvi import ViTokenizer  # type: ignore

        return ViTokenizer.tokenize(text)
    except ImportError:
        return text


def _split_keep_sep(text: str, sep: str) -> list[str]:
    """Split on sep, keeping the separator attached to the preceding piece."""
    parts = text.split(sep)
    out = [p + sep for p in parts[:-1]]
    if parts[-1]:
        out.append(parts[-1])
    return [p for p in out if p]


def _merge_pieces(pieces: list[str], chunk_size: int, overlap: int, length: Callable[[str], int]) -> list[str]:
    """Greedy accumulate pieces into chunks ≤ chunk_size, carrying a suffix of
    pieces totalling ≤ overlap into the next chunk."""
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for piece in pieces:
        plen = length(piece)
        if cur and cur_len + plen > chunk_size:
            chunks.append("".join(cur).strip())
            # retain overlap suffix
            keep: list[str] = []
            keep_len = 0
            for p in reversed(cur):
                pl = length(p)
                if keep_len + pl > overlap:
                    break
                keep.insert(0, p)
                keep_len += pl
            cur, cur_len = keep, keep_len
        cur.append(piece)
        cur_len += plen
    if cur:
        chunks.append("".join(cur).strip())
    return [c for c in chunks if c]


def _recursive_split(
    text: str,
    separators: Sequence[str],
    chunk_size: int,
    overlap: int,
    length: Callable[[str], int] = len,
) -> list[str]:
    if length(text) <= chunk_size:
        return [text.strip()] if text.strip() else []
    sep = next((s for s in separators if s in text), None)
    if sep is None:
        # hard character split as last resort
        step = max(chunk_size - overlap, 1)
        return [text[i : i + chunk_size].strip() for i in range(0, len(text), step)]
    rest = [s for s in separators if s != sep]
    pieces: list[str] = []
    for piece in _split_keep_sep(text, sep):
        if length(piece) > chunk_size:
            pieces.extend(_recursive_split(piece, rest, chunk_size, overlap, length))
        else:
            pieces.append(piece)
    return _merge_pieces(pieces, chunk_size, overlap, length)


def chunk_text(
    text: str,
    *,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    max_tokens: int = MAX_TOKENS,
    segment: bool = False,
) -> list[str]:
    """Reference-contract chunker: char-budget recursive split, then token
    re-split of over-long chunks, drop chunks ≤ 10 chars."""
    if not text:
        return []
    if segment:
        text = vi_segment(text)
    chunks = _recursive_split(text, DEFAULT_SEPARATORS, chunk_size, overlap)
    out: list[str] = []
    for c in chunks:
        if _whitespace_tokens(c) > max_tokens:
            out.extend(
                _recursive_split(
                    c,
                    DEFAULT_SEPARATORS,
                    int(max_tokens * 0.75),
                    TOKEN_OVERLAP,
                    length=_whitespace_tokens,
                )
            )
        else:
            out.append(c)
    return [c for c in out if len(c) > MIN_CHUNK_CHARS]


@F.pandas_udf(T.ArrayType(T.StringType()))
def chunk_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: chunk_text(t) if t else [])


def chunk_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → (id, pos, chunk) exploded table (the article_chunks shape,
    FIXTURES.md)."""
    return df.select(
        F.col(id_col), F.posexplode(chunk_text_udf(F.col(text_col))).alias("pos", "chunk")
    )


def chunk_fixed_expr(col: Column, chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> Column:
    """Native sliding-window chunker: array of substrings of length
    ``chunk_size`` advancing by ``chunk_size - overlap``.  Pure codegen —
    the 100 TB fast path, and exactly mirrorable in the SQL oracle."""
    step = chunk_size - overlap
    starts = F.sequence(F.lit(0), F.greatest(F.length(col) - 1, F.lit(0)), F.lit(step))
    return F.filter(
        F.transform(starts, lambda i: F.substring(col, i + 1, chunk_size)),
        lambda c: F.length(c) > MIN_CHUNK_CHARS,
    )
