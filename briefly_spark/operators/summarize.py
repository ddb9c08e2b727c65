"""Summarize + fact-check operators (SURVEY §2.9 M5/M6) — deterministic
stub implementations as pure Column expressions, shared by the query pack
(q61/q62) and the jobs layer.

The LLM backends plug in behind the same column contract via
``mapInPandas`` (see operators/embedding.py for the harness pattern); the
stubs below are the test/oracle implementations mandated by SURVEY §7.2
(no randomness in correctness paths).
"""

from __future__ import annotations

from pyspark.sql import Column
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
