"""TTS pack — M7 synthesis stub through the real Arrow plumbing, with the
hash-seeded voice policy; the audio payload itself is oracle-checked (the
fake waveform has an exact SQL mirror: repeat(md5(text), k))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.operators.tts import VOICES, pick_voice, synthesize_speech
from briefly_spark.queries import register


@register(
    "q91_tts_synthesis",
    covers=("M7", "K7", "F9"),
    oracle=f"""
WITH v AS (
  SELECT doc_id,
         'https://ex/' || CAST(doc_id AS VARCHAR) AS url,
         1 + length(text) // 100 AS k,
         md5(text) AS h
  FROM documents
)
SELECT doc_id,
       [{", ".join(f"'{v}'" for v in VOICES)}]
         [(strpos('0123456789abcdef', substr(md5(url), 1, 1)) - 1) % {len(VOICES)} + 1] AS voice,
       md5(repeat(h, CAST(k AS INT))) AS audio_md5,
       32 * k AS n_bytes
FROM v
""",
)
def q91_tts_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TTS job's dataflow (text_to_speech.py:56-112 set-oriented):
    deterministic voice pick per url (no random.choice — SURVEY §7.2),
    Arrow-batched synthesis producing real BinaryType audio, content-hash
    + size audit columns.  The upload sink (foreachPartition + token
    lifecycle + idempotency keys) is exercised in tests — side effects
    don't belong in a query result."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    url = F.concat(F.lit("https://ex/"), F.col("doc_id").cast("string"))
    audio = synthesize_speech(docs, "text", "doc_id", backend="fake")
    voices = docs.select("doc_id", pick_voice(url).alias("voice"))
    return voices.join(audio, "doc_id").select(
        "doc_id",
        "voice",
        F.md5("audio").alias("audio_md5"),
        F.col("n_bytes"),
    )
