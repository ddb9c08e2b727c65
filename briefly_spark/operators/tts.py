"""TTS operators — SURVEY §2.9 M7 (speech synthesis) and M8 (upload sink
with auth lifecycle), deterministic-stub + injectable-backend discipline.

M7: synthesis is an Arrow-batched ``mapInPandas`` producing BinaryType
audio; the fake backend derives bytes from the text hash (byte-identical
to its SQL mirror, so even audio payloads are oracle-checkable); the
OpenAI backend is import/env-gated behind the same contract.  Voice
choice is hash-seeded per url (SURVEY §7.2 replaces random.choice,
tts_utils.py:47-54).

M8: upload is a ``foreachPartition`` side-effecting sink with an
idempotency key per record (re-delivery overwrites, never duplicates —
at-least-once × idempotent = effectively-once) and a per-partition token
manager that refreshes on expiry (upload_audio_utils.py:81-97's 14-minute
refresh loop, injectable for tests)."""

from __future__ import annotations

import hashlib
import os
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

#: 4 male + 4 female voices (tts_utils.py:47-54), hash-picked
VOICES = ("onyx", "echo", "fable", "alloy", "nova", "shimmer", "coral", "sage")


def pick_voice(url: Column) -> Column:
    """Deterministic voice from the url hash (nibble mod len(VOICES))."""
    nib = F.instr(F.lit(HEX), F.substring(F.md5(url), 1, 1)) - 1
    return F.element_at(F.array(*[F.lit(v) for v in VOICES]), (nib % len(VOICES) + 1).cast("int"))


#: gender-scoped pools (tts_utils.py:47-54's male/female voice sets)
MALE_VOICES = VOICES[:4]
FEMALE_VOICES = VOICES[4:]


def gender_voice(url: Column, gender: str) -> Column:
    """Deterministic gender-scoped voice for the dual-voice TTS job
    (text_to_speech.py:58-62's male/female configs; random.choice replaced
    by the url-hash pick per SURVEY §7.2 — same nibble as pick_voice, so
    one article's male and female voices share an index)."""
    if gender not in ("male", "female"):
        raise ValueError(f"gender must be 'male' or 'female', got {gender!r}")
    pool = MALE_VOICES if gender == "male" else FEMALE_VOICES
    nib = F.instr(F.lit(HEX), F.substring(F.md5(url), 1, 1)) - 1
    return F.element_at(
        F.array(*[F.lit(v) for v in pool]), (nib % len(pool) + 1).cast("int")
    )


def fake_audio_py(text: str) -> bytes:
    """Deterministic stand-in waveform: the text digest repeated to a
    length proportional to the text (SQL mirror: repeat(md5(text), k))."""
    k = 1 + len(text) // 100
    return (hashlib.md5(text.encode()).hexdigest() * k).encode()


def _load_tts_backend(backend: str, voice: str = "alloy") -> Callable[[str], bytes]:
    """Resolve the synthesis function — called INSIDE the mapInPandas
    generator so resolution happens once per executor process (clients are
    not picklable; never capture them in a driver-side closure).  'openai'
    is implemented against the public sdk surface
    (client.audio.speech.create, tts_utils.py:56-63's call shape) and
    import-gated: NotImplementedError when the sdk is absent (this
    container); the branch is exercised in tests via a mock-injected
    ``openai`` module."""
    if backend == "fake":
        return fake_audio_py
    if backend == "openai":
        try:
            from openai import OpenAI  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "openai TTS backend requires the sdk + OPENAI_API_KEY on "
                "executors; use backend='fake' for deterministic tests"
            ) from exc
        client = OpenAI()

        def synth(text: str) -> bytes:
            resp = client.audio.speech.create(model="tts-1", voice=voice, input=text)
            return resp.content

        return synth
    raise ValueError(f"unknown tts backend {backend!r}")


def synthesize_speech(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    backend: str = "fake",
    voice: str = "alloy",
) -> DataFrame:
    """(id, text) → (id, audio, n_bytes): one Arrow-batched stage, backend
    resolved once per executor via :func:`_load_tts_backend`.  The
    deterministic 'fake' backend is the test/oracle path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        synth = _load_tts_backend(backend, voice)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            audio = [synth(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "audio": audio,
                    "n_bytes": [len(a) for a in audio],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"`{id_col}` long, audio binary, n_bytes long"
    )


# ---------------------------------------------------------------------------
# M8 — upload sink with token lifecycle
# ---------------------------------------------------------------------------
class TokenManager:
    """Bearer-token holder refreshing on expiry (the reference refreshes
    every 14 min and retries 401s, upload_audio_utils.py:81-97).  One
    instance per partition; ``refresh_fn`` is injected (tests count
    refreshes, production calls the signin endpoint)."""

    def __init__(self, refresh_fn: Callable[[], str], ttl_s: float = 14 * 60):
        self._refresh_fn = refresh_fn
        self._ttl = ttl_s
        self._token: str | None = None
        self._expires_at = 0.0

    def token(self) -> str:
        now = time.monotonic()
        if self._token is None or now >= self._expires_at:
            self._token = self._refresh_fn()
            self._expires_at = now + self._ttl
        return self._token


def upload_audio_sink(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "article_id",
    audio_col: str = "audio",
    refresh_fn: Callable[[], str] | None = None,
    uploader: Callable[[str, str, bytes], None] | None = None,
    token_ttl_s: float = 14 * 60,
) -> None:
    """foreachPartition upload (K7): per record, derive the idempotency key
    md5(id), obtain a valid token from the per-partition TokenManager, and
    hand (key, token, payload) to the uploader.  The default uploader
    writes ``{key}.bin`` under ``out_dir`` — an object-store-shaped sink
    where re-upload of the same key is an overwrite, making at-least-once
    delivery effectively-once."""
    os.makedirs(out_dir, exist_ok=True)

    def default_uploader(key: str, token: str, payload: bytes) -> None:
        with open(os.path.join(out_dir, f"{key}.bin"), "wb") as f:
            f.write(payload)

    up = uploader or default_uploader
    refresh = refresh_fn or (lambda: "local-token")

    def sink(rows) -> None:
        tm = TokenManager(refresh, ttl_s=token_ttl_s)
        for row in rows:
            key = hashlib.md5(str(row[id_col]).encode()).hexdigest()
            up(key, tm.token(), bytes(row[audio_col]))

    df.select(id_col, audio_col).foreachPartition(sink)
