"""Summarize + fact-check operators (SURVEY §2.9 M5/M6) — deterministic
stub implementations as pure Column expressions, shared by the query pack
(q61/q62) and the jobs layer, PLUS the import-gated real-LLM backends
behind the same DataFrame contract (the operators/tts.py seam pattern).

Stubs are the test/oracle implementations mandated by SURVEY §7.2 (no
randomness in correctness paths).  The real backends:

- M5 ``summarize_articles(backend="openai")``: the reference's
  async-fan-out-in-batch harness (summarize_utils.py:14-58 — AsyncOpenAI
  chat, temperature 0.4, max_tokens 225, 3 retries, content[:500]
  fallback) rebuilt as ``mapInPandas`` with a bounded asyncio semaphore
  INSIDE each Arrow batch; one client per executor process.
- M6 ``factcheck_articles(backend="serper_groq")``: the reference's
  Serper-search + Groq structured fact-check orchestration
  (validation_utils.py:40-165 — Vietnam-locale last-day search, result-
  count buckets, 10 000/100 chunking, per-statement confirmed/refuted
  verdicts, the A6 score formula) with the randomness removed per §7.2
  (the 20% random early-return is dropped; the rand(3,5) bucket is a
  fixed 3).  Groq is reached through its public OpenAI-compatible
  endpoint.

Both are NotImplementedError-gated when the sdk or API keys are absent
(this container) and exercised via mock-injected modules in
tests/test_backend_seams.py — exactly like tts.py's openai branch.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from briefly_spark.operators.chunking import chunk_fixed_expr
from briefly_spark.operators.textstats import tokens

HEX = "0123456789abcdef"

#: reference contract: exactly 4 key points (summarize_utils.py:23,78)
N_POINTS = 4
#: words per extractive "sentence" in the stub
SENT_WORDS = 10
#: fallback = first 500 chars of content (summarize_utils.py:70)
FALLBACK_CHARS = 500


def summary_bullets(text: Column) -> Column:
    """M5 stub: first ``N_POINTS`` 10-word sentences as a bullet array;
    single-element fallback array (truncated content) for short inputs."""
    words = tokens(text)
    sents = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(SENT_WORDS)),
        lambda i: F.array_join(F.slice(words, i, SENT_WORDS), " "),
    )
    ok = F.size(words) >= SENT_WORDS
    return F.when(ok, F.slice(sents, 1, N_POINTS)).otherwise(
        F.array(F.substring(text, 1, FALLBACK_CHARS))
    )


def summary_status(text: Column) -> Column:
    """'ok' | 'fallback' tag (SURVEY §7.2: keep the truncation fallback but
    mark it instead of silently mixing it with real summaries)."""
    return F.when(F.size(tokens(text)) >= SENT_WORDS, F.lit("ok")).otherwise(F.lit("fallback"))


def _verdict_nibble(stmt: Column) -> Column:
    return F.instr(F.lit(HEX), F.substring(F.md5(stmt), 1, 1)) - 1


def factcheck_score(text: Column) -> Column:
    """M6 stub + A6 formula as one per-row expression (no shuffle): split
    into ~100-char statements, md5-bucket verdicts (50% confirmed, ~19%
    refuted), score = clamp(((#confirmed − 0.5·#refuted)/total)·10, 3, 10)
    (validation_utils.py:157-163 minus the randomness)."""
    stmts = chunk_fixed_expr(text, 100, 0)
    n_conf = F.size(F.filter(stmts, lambda s: _verdict_nibble(s) < 8))
    n_ref = F.size(
        F.filter(stmts, lambda s: (_verdict_nibble(s) >= 8) & (_verdict_nibble(s) < 11))
    )
    n_tot = F.size(stmts)
    raw = (n_conf - 0.5 * n_ref) / n_tot * 10
    return F.when(
        n_tot > 0, F.least(F.greatest(raw, F.lit(3.0)), F.lit(10.0)).cast("double")
    ).otherwise(F.lit(3.0))


# ---------------------------------------------------------------------------
# M5 — batch summarize operator: deterministic stub + import-gated OpenAI
# backend behind ONE DataFrame contract (the tts.py seam pattern).
# ---------------------------------------------------------------------------
#: the reference's editor instruction (summarize_utils.py:23): exactly 4
#: newline-separated Vietnamese key points, no preamble/numbering/bullets
_SYSTEM_PROMPT = (
    "Bạn là một biên tập viên. Tóm tắt bài báo thành đúng 4 ý chính bằng "
    "tiếng Việt, mỗi ý một dòng, không câu mở đầu, không đánh số, không "
    "gạch đầu dòng."
)
#: reference generation parameters (summarize_utils.py:27-29)
_SUMMARIZE_TEMPERATURE = 0.4
_SUMMARIZE_MAX_TOKENS = 225
_SUMMARIZE_RETRIES = 3


def _load_summarize_backend(
    backend: str,
    *,
    model: str = "gpt-4o-mini",
    max_concurrency: int = 8,
) -> Callable[[list[str]], list[str | None]]:
    """Resolve the batch summarizer — called INSIDE the mapInPandas
    generator so the (unpicklable) client is built once per executor
    process.  'openai' reproduces the reference call shape
    (summarize_utils.py:14-39): AsyncOpenAI chat completion, system
    prompt above, temperature 0.4, max_tokens 225, 3 attempts with a
    2 s·attempt backoff; a row that exhausts retries (or returns empty)
    yields None and the caller applies the content[:500] fallback
    (summarize_utils.py:70).  The async fan-out runs INSIDE the Arrow
    batch under a bounded semaphore — the reference's
    asyncio.gather-per-batch harness (summarize_utils.py:41-58) without
    the per-row process launch."""
    if backend == "openai":
        try:
            from openai import AsyncOpenAI  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "openai summarize backend requires the sdk + OPENAI_API_KEY "
                "on executors; use backend='stub' for deterministic tests"
            ) from exc
        if not os.environ.get("OPENAI_API_KEY"):
            # sdk-present/key-absent must surface the documented seam
            # signal, not an opaque OpenAIError from inside mapInPandas
            # (review r13 — the factcheck twin already gated its keys)
            raise NotImplementedError(
                "openai summarize backend requires OPENAI_API_KEY on "
                "executors; use backend='stub' for deterministic tests"
            )
        import asyncio

        def summarize_batch(texts: list[str]) -> list[str | None]:
            async def one(client, text: str, sem) -> str | None:
                for attempt in range(1, _SUMMARIZE_RETRIES + 1):
                    try:
                        # the semaphore bounds CONCURRENT API CALLS only —
                        # holding it across the backoff sleep would let a
                        # failing batch serialize behind sleeping slots
                        # (review r13 pass 2: 10 k rows × 6 s of held-slot
                        # sleeps ≈ hours)
                        async with sem:
                            resp = await client.chat.completions.create(
                                messages=[
                                    {"role": "system", "content": _SYSTEM_PROMPT},
                                    {"role": "user", "content": text},
                                ],
                                model=model,
                                temperature=_SUMMARIZE_TEMPERATURE,
                                max_tokens=_SUMMARIZE_MAX_TOKENS,
                            )
                        out = (resp.choices[0].message.content or "").strip()
                        if not out:
                            raise ValueError("empty summary")
                        return out
                    except Exception as exc:
                        if _is_config_error(exc):
                            # auth/permission/bad-model affects EVERY row:
                            # fail the task loudly instead of burning the
                            # full retry ladder per row and returning a
                            # "successful" all-fallback batch
                            raise
                        if attempt == _SUMMARIZE_RETRIES:
                            return None
                        await asyncio.sleep(2.0 * attempt)
                return None

            async def run() -> list[str | None]:
                # the client lives INSIDE the per-batch event loop
                # (asyncio.run() closes its loop at batch end; a client
                # shared across batches would die with the first loop —
                # review r13) and is CLOSED before the loop exits: tearing
                # the loop down with the httpx pool still open leaks
                # connections/FDs on long-running executors (ADVICE r13)
                client = AsyncOpenAI()
                try:
                    sem = asyncio.Semaphore(max_concurrency)
                    return list(
                        await asyncio.gather(*[one(client, t, sem) for t in texts])
                    )
                finally:
                    await client.close()

            return asyncio.run(run())

        return summarize_batch
    raise ValueError(f"unknown summarize backend {backend!r}")


#: sdk exception class names that mean MISCONFIGURATION, not transience —
#: matched by name so the seam needs no sdk import at module load
_CONFIG_ERROR_NAMES = frozenset(
    {"AuthenticationError", "PermissionDeniedError", "NotFoundError"}
)
#: 4xx statuses (and sdk names) that are TRANSIENT despite the class:
#: 429 rate-limit (OpenAI RateLimitError; Serper via raise_for_status)
#: and 408 request-timeout recover on their own — treating them as
#: config errors kills the Spark task under load, skipping the retry
#: ladder / per-row fallback and re-billing the whole batch on task
#: retry, the exact failure mode this design exists to avoid (ADVICE
#: r13 medium)
_TRANSIENT_ERROR_NAMES = frozenset({"RateLimitError", "APITimeoutError"})
_TRANSIENT_STATUSES = frozenset({408, 429})


def _is_config_error(exc: Exception) -> bool:
    """True for errors that will fail every row identically (bad key,
    revoked permission, unknown model / 4xx client errors): retrying or
    masking them turns a configuration mistake into a silent all-fallback
    run (review r13 pass 2).  Rate-limit/timeout responses (429/408) are
    load-dependent, not configuration — they follow the transient path
    (retry ladder / per-row fallback) even though they are 4xx."""
    name = type(exc).__name__
    if name in _TRANSIENT_ERROR_NAMES:
        return False
    if name in _CONFIG_ERROR_NAMES:
        return True
    status = getattr(getattr(exc, "response", None), "status_code", None)
    return (
        status is not None
        and 400 <= int(status) < 500
        and int(status) not in _TRANSIENT_STATUSES
    )


def _id_field(df: DataFrame, id_col: str) -> tuple[str, str | None]:
    """(spark schema type, pandas astype target) for the live-path id
    column, derived from ``df.schema`` AT THE API BOUNDARY — the schema
    was previously hardcoded to ``long``/``astype('int64')``, so a
    string or decimal id failed (or silently truncated) deep inside the
    executor instead of raising here (ADVICE r13).  Integral widths all
    widen losslessly to long; string ids pass through; anything else is
    a loud TypeError naming the column and its type."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    dt = df.schema[id_col].dataType
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return "long", "int64"
    if isinstance(dt, StringType):
        return "string", None
    raise TypeError(
        f"id column {id_col!r} has type {dt.simpleString()}; the live "
        "summarize/fact-check paths support integral or string ids — cast "
        "explicitly before calling"
    )


def summarize_articles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    backend: str = "stub",
    model: str = "gpt-4o-mini",
    max_concurrency: int = 8,
) -> DataFrame:
    """(id, text) → (id, summary array<string>, summary_status): ONE
    column contract over both implementations.  'stub' is the
    oracle-gated Column-expression path (q61/q62's surface — hashes
    unchanged); 'openai' is the Arrow-batched async fan-out, splitting
    the model's newline points into the bullet array
    (summarize_utils.py:78) and tagging rows that fell back to
    content[:500] with status='fallback' (SURVEY §7.2: mark, don't mix)."""
    if backend == "stub":
        t = F.col(text_col)
        return df.select(
            id_col,
            summary_bullets(t).alias("summary"),
            summary_status(t).alias("summary_status"),
        )

    id_type, id_cast = _id_field(df, id_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _load_summarize_backend(
            backend, model=model, max_concurrency=max_concurrency
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = fn([str(t) for t in pdf[text_col]])
            summaries, statuses = [], []
            for text, out in zip(pdf[text_col], outs):
                if out is None:
                    summaries.append([str(text)[:FALLBACK_CHARS]])
                    statuses.append("fallback")
                else:
                    summaries.append([x.strip() for x in out.split("\n") if x.strip()])
                    statuses.append("ok")
            ids = pdf[id_col].astype(id_cast) if id_cast else pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "summary": summaries,
                    "summary_status": statuses,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen,
        schema=f"`{id_col}` {id_type}, summary array<string>, summary_status string",
    )


# ---------------------------------------------------------------------------
# M6 — batch fact-check operator: deterministic stub + import-gated
# Serper+Groq orchestration behind ONE DataFrame contract.
# ---------------------------------------------------------------------------
#: fact-check chunking (validation_utils.py:31-37)
_FACTCHECK_CHUNK = 10_000
_FACTCHECK_OVERLAP = 100
#: Groq model id (validation_utils.py's llama-4-scout default)
_FACTCHECK_MODEL = "meta-llama/llama-4-scout-17b-16e-instruct"
#: Groq's public OpenAI-compatible endpoint
_GROQ_BASE_URL = "https://api.groq.com/openai/v1"
_SERPER_URL = "https://google.serper.dev/search"

#: structured fact-check instruction (validation_utils.py:92-117's JSON
#: contract): per statement — confirmed / refuted / unverifiable / vague
_FACTCHECK_PROMPT = (
    "Kiểm tra tính chính xác của văn bản tiếng Việt sau. Với mỗi tuyên bố, "
    "phân loại 'confirmed', 'refuted', 'unverifiable' hoặc 'vague' kèm giải "
    'thích ngắn. Trả về JSON: {"result": [{"statement": "...", '
    '"status": "...", "explanation": "...", "suggested_keywords": ["..."]}]}'
    "\n\n{text}"
)


def _load_factcheck_backend(
    backend: str,
    *,
    model: str = _FACTCHECK_MODEL,
    max_results: int = 10,
) -> Callable[[list[str]], list[float]]:
    """Resolve the batch fact-checker.  'serper_groq' reproduces the
    reference orchestration (validation_utils.py:40-165): Serper web
    search (Vietnam locale, last-day, 10 results) seeded by the summary's
    first 100 chars with an lru_cache, the result-count buckets
    (0 → 0, <5 → 1, <8 → 2, <10 → 3 — the reference's rand(3,5) arm is a
    FIXED 3 per SURVEY §7.2, and its 20% random early-return is dropped),
    then 10 000/100 chunking and a per-chunk structured fact-check
    through Groq's OpenAI-compatible chat endpoint, scored with the A6
    formula clamp(((#confirmed − 0.5·#refuted)/total)·10, 3, 10)
    (validation_utils.py:157-163)."""
    if backend == "serper_groq":
        try:
            import requests  # type: ignore
            from openai import OpenAI  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "serper_groq fact-check backend requires the requests + "
                "openai sdks; use backend='stub' for deterministic tests"
            ) from exc
        import json as _json
        from functools import lru_cache

        serper_key = os.environ.get("SERPER_API_KEY")
        groq_key = os.environ.get("GROQ_API_KEY")
        if not serper_key or not groq_key:
            raise NotImplementedError(
                "serper_groq fact-check backend requires SERPER_API_KEY and "
                "GROQ_API_KEY on executors"
            )
        client = OpenAI(base_url=_GROQ_BASE_URL, api_key=groq_key)

        @lru_cache(maxsize=1000)  # validation_utils.py:40's search cache
        def search(query: str) -> int:
            # GET with url-encoded params is the REFERENCE's observed-
            # working call shape (validation_utils.py:55-59 builds
            # "/search?<urlencoded>" and requests.get()s it) — kept as the
            # behavioral spec; if the service ever rejects GET, the 4xx
            # surfaces loudly through _is_config_error below rather than
            # masking as per-row fallback
            resp = requests.get(
                _SERPER_URL,
                headers={"X-API-KEY": serper_key, "Content-Type": "application/json"},
                params={
                    "q": query,
                    "location": "Vietnam",
                    "gl": "vn",
                    "hl": "vi",
                    "tbs": "qdr:d",
                    "num": max_results,
                },
                timeout=10,
            )
            resp.raise_for_status()
            return len(resp.json().get("organic", []))

        def score_one(summary: str) -> float:
            n_results = search(summary[:100])  # validation_utils.py:124
            if n_results < max_results:  # count buckets, de-randomized
                if n_results == 0:
                    return 0.0
                if n_results < 5:
                    return 1.0
                if n_results < 8:
                    return 2.0
                return 3.0
            chunks = [
                summary[i : i + _FACTCHECK_CHUNK]
                for i in range(
                    0, max(len(summary), 1), _FACTCHECK_CHUNK - _FACTCHECK_OVERLAP
                )
            ]
            statuses: list[str] = []
            for ch in chunks:
                resp = client.chat.completions.create(
                    model=model,
                    messages=[
                        {
                            "role": "user",
                            "content": _FACTCHECK_PROMPT.replace("{text}", ch),
                        }
                    ],
                    response_format={"type": "json_object"},
                )
                parsed = _json.loads(resp.choices[0].message.content or "{}")
                result = parsed.get("result", [])
                statuses.extend(
                    str(r.get("status", ""))
                    for r in (result if isinstance(result, list) else [])
                    if isinstance(r, dict)
                )
            total = len(statuses)
            if total == 0:
                return 3.0
            n_conf = sum(1 for s in statuses if s == "confirmed")
            n_ref = sum(1 for s in statuses if s == "refuted")
            raw = (n_conf - 0.5 * n_ref) / total * 10
            # same fractional scale as the stub (review r13: int() here
            # made backend='stub' -> live a coarsening, not a swap)
            return float(min(max(raw, 3.0), 10.0))

        def factcheck_batch(texts: list[str]) -> list[float]:
            out = []
            for t in texts:
                # one TRANSIENT Serper/Groq failure must not kill the
                # Spark task (and re-bill every call in the batch on
                # retry): the reference's per-article error fallback is
                # validation_score = 2 (summarize_utils.py:76-77) —
                # mirror it per row.  Configuration errors (bad key,
                # rejected call shape — any 4xx) affect EVERY row
                # identically and re-raise instead: a silent all-2.0 run
                # is indistinguishable from healthy low-confidence output
                # (review r13 passes 1+2).
                try:
                    out.append(score_one(str(t)))
                except Exception as exc:
                    if _is_config_error(exc):
                        raise
                    out.append(2.0)
            return out

        return factcheck_batch
    raise ValueError(f"unknown fact-check backend {backend!r}")


def factcheck_articles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    backend: str = "stub",
    model: str = _FACTCHECK_MODEL,
) -> DataFrame:
    """(id, text) → (id, validation_score): ONE column contract over the
    deterministic stub (q61's oracle-gated surface — the A6 formula over
    md5-bucketed statement verdicts) and the live Serper+Groq
    orchestration.  Both paths return the same FRACTIONAL double score
    scale (review r13: the live path's early int() truncation made a
    backend swap a silent coarsening), so a pipeline can switch backends
    without schema or scale changes."""
    if backend == "stub":
        return df.select(
            id_col,
            factcheck_score(F.col(text_col)).cast("double").alias("validation_score"),
        )

    id_type, id_cast = _id_field(df, id_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _load_factcheck_backend(backend, model=model)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            scores = fn([str(t) for t in pdf[text_col]])
            ids = pdf[id_col].astype(id_cast) if id_cast else pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "validation_score": [float(s) for s in scores],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"`{id_col}` {id_type}, validation_score double"
    )
