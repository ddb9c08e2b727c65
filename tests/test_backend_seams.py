"""Real-backend seam tests: the import-gated `model` / `pil` / `openai`
branches run at least once via mock-injected modules.

The mocks are injected with sys.modules patching and the loader functions
are called DIRECTLY (driver-side): mapInPandas resolves backends inside
worker processes, where a driver-side sys.modules patch would not reach —
these tests cover the branch logic; the worker-side plumbing is covered by
the deterministic backends under the oracle gate (q60/q63/q81/q91).

No Spark session needed — pure Python unit tests.
"""

from __future__ import annotations

import hashlib
import io
import sys
import types

import pytest


@pytest.fixture
def clean_modules(monkeypatch):
    """Inject/remove fake third-party modules per test."""
    def inject(name: str, module: types.ModuleType) -> None:
        monkeypatch.setitem(sys.modules, name, module)

    return inject


# ---------------------------------------------------------------------------
# sentence-transformers seam (operators/embedding.py `model` backend)
# ---------------------------------------------------------------------------
def _fake_sentence_transformers() -> types.ModuleType:
    mod = types.ModuleType("sentence_transformers")

    class SentenceTransformer:
        def __init__(self, name: str):
            self.name = name

        def encode(self, texts, batch_size=8):
            # deterministic 4-dim vector from the text digest
            return [
                [int(hashlib.md5(f"{t}:{d}".encode()).hexdigest()[:2], 16) / 256.0
                 for d in range(4)]
                for t in texts
            ]

    mod.SentenceTransformer = SentenceTransformer
    return mod


def test_model_backend_runs_with_mock(clean_modules):
    from briefly_spark.operators import embedding

    clean_modules("sentence_transformers", _fake_sentence_transformers())
    embedding._BACKEND_CACHE.pop("model:4", None)
    try:
        fn = embedding._load_backend("model", 4)
        vecs = fn(["xin chào", "hello"])
        assert len(vecs) == 2 and all(len(v) == 4 for v in vecs)
        assert all(isinstance(x, float) for v in vecs for x in v)
        # singleton: second resolution returns the cached callable
        assert embedding._load_backend("model", 4) is fn
    finally:
        embedding._BACKEND_CACHE.pop("model:4", None)


def test_model_backend_gated_without_lib():
    from briefly_spark.operators import embedding

    embedding._BACKEND_CACHE.pop("model:4", None)
    assert "sentence_transformers" not in sys.modules
    with pytest.raises(NotImplementedError):
        embedding._load_backend("model", 4)


# ---------------------------------------------------------------------------
# Pillow seam (operators/multimodal.py `pil` backend)
# ---------------------------------------------------------------------------
def _fake_pil() -> tuple[types.ModuleType, types.ModuleType]:
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class FakeImage:
        def __init__(self, data: bytes):
            self._data = data
            self._size = None

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            self._size = size
            return self

        def getdata(self):
            w, h = self._size
            # deterministic pixels from the blob digest
            digest = hashlib.md5(self._data).digest()
            return [digest[i % len(digest)] for i in range(w * h)]

    def open_(fp):
        assert isinstance(fp, io.BytesIO)
        return FakeImage(fp.getvalue())

    image_mod.open = open_
    pil.Image = image_mod
    return pil, image_mod


def test_pil_backend_runs_with_mock(clean_modules):
    from briefly_spark.operators.multimodal import _load_decoder

    pil, image_mod = _fake_pil()
    clean_modules("PIL", pil)
    clean_modules("PIL.Image", image_mod)
    fn = _load_decoder("pil", dims=4)
    blob = b"\x89PNG-fake-bytes"
    feats = fn([blob])
    assert len(feats) == 1 and len(feats[0]) == 4
    # column-mean luminance lands in [-0.5, 0.5)
    assert all(-0.5 <= x < 0.5 for x in feats[0])
    # deterministic: identical blob → identical features
    assert fn([blob]) == feats
    # matches the documented formula: mean of column pixels / 255 - 0.5
    digest = hashlib.md5(blob).digest()
    px = [digest[i % len(digest)] for i in range(16)]
    expected = [sum(px[c::4]) / (255.0 * 4) - 0.5 for c in range(4)]
    assert feats[0] == expected


def test_pil_backend_gated_without_lib():
    from briefly_spark.operators.multimodal import _load_decoder

    assert "PIL" not in sys.modules
    with pytest.raises(NotImplementedError):
        _load_decoder("pil", dims=4)


# ---------------------------------------------------------------------------
# OpenAI TTS seam (operators/tts.py `openai` backend)
# ---------------------------------------------------------------------------
def _fake_openai() -> types.ModuleType:
    mod = types.ModuleType("openai")

    class _Resp:
        def __init__(self, content: bytes):
            self.content = content

    class _Speech:
        def create(self, *, model, voice, input):
            return _Resp(f"{model}|{voice}|{input}".encode())

    class _Audio:
        def __init__(self):
            self.speech = _Speech()

    class OpenAI:
        def __init__(self):
            self.audio = _Audio()

    mod.OpenAI = OpenAI
    return mod


def test_openai_tts_backend_runs_with_mock(clean_modules):
    from briefly_spark.operators.tts import _load_tts_backend

    clean_modules("openai", _fake_openai())
    synth = _load_tts_backend("openai", voice="nova")
    assert synth("hi there") == b"tts-1|nova|hi there"


def test_openai_tts_backend_gated_without_lib():
    from briefly_spark.operators.tts import _load_tts_backend

    assert "openai" not in sys.modules
    with pytest.raises(NotImplementedError):
        _load_tts_backend("openai")


# ---------------------------------------------------------------------------
# pyvi seam (operators/chunking.py vi_segment)
# ---------------------------------------------------------------------------
def test_pyvi_segmentation_runs_with_mock(clean_modules):
    from briefly_spark.operators.chunking import chunk_text, vi_segment

    pyvi = types.ModuleType("pyvi")

    class ViTokenizer:
        @staticmethod
        def tokenize(text):
            # the real tokenizer joins Vietnamese compounds with underscores
            return text.replace("xin chào", "xin_chào")

    pyvi.ViTokenizer = ViTokenizer
    clean_modules("pyvi", pyvi)
    assert vi_segment("xin chào thế giới") == "xin_chào thế giới"
    # segment=True routes chunking through the tokenizer pre-pass
    chunks = chunk_text("xin chào " * 60, segment=True)
    assert chunks and all("xin_chào" in c for c in chunks)


def test_pyvi_identity_without_lib():
    from briefly_spark.operators.chunking import vi_segment

    assert "pyvi" not in sys.modules
    assert vi_segment("xin chào") == "xin chào"


# ---------------------------------------------------------------------------
# REAL-decode contract: stdlib PNG backend on genuine PNG bytes (no mocks)
# ---------------------------------------------------------------------------
def _png_bytes(width, height, pixels, *, color=False, filters=None):
    """Assemble a real PNG (correct chunk CRCs) from row-major pixel data.
    ``filters`` picks the per-scanline filter type actually encoded, so
    the decoder's unfilter paths are exercised on authentic streams."""
    import struct
    import zlib

    nch = 3 if color else 1
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(width * nch)
    for y in range(height):
        line = bytearray()
        for x in range(width):
            p = pixels[y * width + x]
            line.extend(p if color else [p])
        ft = filters[y]
        raw.append(ft)
        enc = bytearray(line)
        if ft == 1:  # Sub
            for i in range(len(line) - 1, nch - 1, -1):
                enc[i] = (line[i] - line[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(line)):
                enc[i] = (line[i] - prev[i]) & 0xFF
        raw.extend(enc)
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2 if color else 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_gray_roundtrip_all_filters():
    from briefly_spark.operators.multimodal import png_decode_gray

    px = [(x * 37 + y * 11) % 256 for y in range(6) for x in range(5)]
    blob = _png_bytes(5, 6, px, filters=[0, 1, 2, 1, 2, 0])
    w, h, got = png_decode_gray(blob)
    assert (w, h) == (5, 6)
    assert got == px  # pixel-exact through encode->zlib->unfilter->decode


def test_png_decode_rgb_luma():
    from briefly_spark.operators.multimodal import png_decode_gray

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    blob = _png_bytes(2, 2, px, color=True)
    w, h, got = png_decode_gray(blob)
    assert (w, h) == (2, 2)
    assert got == [255 * 299 // 1000, 255 * 587 // 1000, 255 * 114 // 1000, 255]


def test_png_backend_features_match_hand_computation():
    from briefly_spark.operators.multimodal import _load_decoder

    dims = 4
    px = [(x * 53 + y * 29) % 256 for y in range(8) for x in range(8)]
    blob = _png_bytes(8, 8, px, filters=[0, 1, 2, 0, 1, 2, 0, 1])
    fn = _load_decoder("png", dims)
    feats = fn([blob])[0]
    # nearest-neighbor sample grid for 8->4: source index (c*8)//4 = 2c
    expected = [
        sum(px[(2 * cy) * 8 + 2 * cx] for cy in range(dims)) / (255.0 * dims) - 0.5
        for cx in range(dims)
    ]
    assert feats == expected


def test_png_backend_rejects_non_png_and_exotic_variants():
    from briefly_spark.operators.multimodal import png_decode_gray

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode_gray(b"GIF89a...")
    # 16-bit depth is out of scope and must fail loudly, not mis-decode
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        png_decode_gray(deep)


# ---------------------------------------------------------------------------
# PIL adapter contract on REAL PNG bytes: the mock fulfils the public
# Pillow signatures by delegating to the genuine stdlib decode, so the
# adapter's call sequence (open(BytesIO) -> convert('L') -> resize ->
# getdata) is validated against actually-decoded pixels.
# ---------------------------------------------------------------------------
def _pil_backed_by_real_decoder() -> tuple[types.ModuleType, types.ModuleType]:
    from briefly_spark.operators.multimodal import png_decode_gray

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class RealImage:
        def __init__(self, w, h, px):
            self.w, self.h, self.px = w, h, px

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            tw, th = size
            px = [
                self.px[((y * self.h) // th) * self.w + (x * self.w) // tw]
                for y in range(th)
                for x in range(tw)
            ]
            return RealImage(tw, th, px)

        def getdata(self):
            return list(self.px)

    def open_(fp):
        assert isinstance(fp, io.BytesIO)
        return RealImage(*png_decode_gray(fp.getvalue()))

    image_mod.open = open_
    pil.Image = image_mod
    return pil, image_mod


def test_pil_adapter_contract_on_real_png(clean_modules):
    from briefly_spark.operators.multimodal import _load_decoder, png_features

    pil, image_mod = _pil_backed_by_real_decoder()
    clean_modules("PIL", pil)
    clean_modules("PIL.Image", image_mod)
    dims = 4
    px = [(x * 7 + y * 13) % 256 for y in range(8) for x in range(8)]
    blob = _png_bytes(8, 8, px, filters=[0, 1, 2, 1, 0, 2, 1, 0])
    got = _load_decoder("pil", dims)([blob])[0]
    # the real-decoder-backed PIL mock and the stdlib png backend agree
    assert got == png_features(blob, dims)


# ---------------------------------------------------------------------------
# sentence-transformers adapter contract: the real library returns a
# numpy float32 ndarray of shape (n, dim) — pin that the adapter
# normalizes it to plain Python float lists.
# ---------------------------------------------------------------------------
def _st_with_recorded_output_shape() -> types.ModuleType:
    import numpy as np

    mod = types.ModuleType("sentence_transformers")

    class SentenceTransformer:
        def __init__(self, name: str):
            self.name = name

        def encode(self, texts, batch_size=8):
            # recorded contract of the real lib: np.ndarray, dtype float32,
            # shape (len(texts), dim)
            rows = [
                [
                    int(hashlib.md5(f"{t}:{d}".encode()).hexdigest()[:2], 16) / 256.0
                    for d in range(4)
                ]
                for t in texts
            ]
            return np.asarray(rows, dtype=np.float32)

    mod.SentenceTransformer = SentenceTransformer
    return mod


def test_model_adapter_normalizes_numpy_float32(clean_modules):
    import numpy as np

    from briefly_spark.operators import embedding

    clean_modules("sentence_transformers", _st_with_recorded_output_shape())
    embedding._BACKEND_CACHE.pop("model:4", None)
    try:
        fn = embedding._load_backend("model", 4)
        vecs = fn(["xin chào", "hello", "a"])
        assert len(vecs) == 3 and all(len(v) == 4 for v in vecs)
        # plain Python floats (Arrow-serializable), float32 values preserved
        assert all(type(x) is float for v in vecs for x in v)
        expected0 = float(
            np.float32(int(hashlib.md5(b"xin ch\xc3\xa0o:0").hexdigest()[:2], 16) / 256.0)
        )
        assert vecs[0][0] == expected0
    finally:
        embedding._BACKEND_CACHE.pop("model:4", None)


# ---------------------------------------------------------------------------
# REAL audio decode contract: stdlib WAV backend on genuine RIFF/PCM bytes,
# cross-validated frame-for-frame against Python's own `wave` reader — two
# independent implementations of the public spec agreeing on the same blob.
# ---------------------------------------------------------------------------
def _wav_bytes(samples_by_channel, *, rate=8000, depth=16):
    """Encode interleaved PCM via the stdlib `wave` writer (16-bit) or by
    hand (8-bit, which `wave` also writes but unsigned-encodes)."""
    import io
    import struct
    import wave

    nch = len(samples_by_channel)
    n = len(samples_by_channel[0])
    fp = io.BytesIO()
    w = wave.open(fp, "wb")
    w.setnchannels(nch)
    w.setsampwidth(depth // 8)
    w.setframerate(rate)
    frames = b""
    for i in range(n):
        for ch in range(nch):
            s = samples_by_channel[ch][i]
            if depth == 16:
                frames += struct.pack("<h", s)
            else:
                frames += struct.pack("<B", s)
    w.writeframes(frames)
    w.close()
    return fp.getvalue()


def test_wav_decode_matches_stdlib_wave_reader():
    import io
    import struct
    import wave

    from briefly_spark.operators.multimodal import wav_decode_pcm

    left = [((i * 997) % 4001) - 2000 for i in range(64)]
    right = [((i * 773) % 3001) - 1500 for i in range(64)]
    blob = _wav_bytes([left, right], rate=16000)
    rate, nch, mono = wav_decode_pcm(blob)
    assert (rate, nch) == (16000, 2)
    # independent read via the stdlib module, then the same downmix
    r = wave.open(io.BytesIO(blob), "rb")
    assert (r.getframerate(), r.getnchannels(), r.getsampwidth()) == (16000, 2, 2)
    raw = struct.unpack(f"<{2 * 64}h", r.readframes(64))
    expected = [(raw[2 * i] + raw[2 * i + 1]) // 2 for i in range(64)]
    assert mono == expected


def test_wav_decode_8bit_recentered():
    from briefly_spark.operators.multimodal import wav_decode_pcm

    vals = [0, 128, 255, 64]
    blob = _wav_bytes([vals], rate=8000, depth=8)
    rate, nch, mono = wav_decode_pcm(blob)
    assert (rate, nch) == (8000, 1)
    assert mono == [(v - 128) * 256 for v in vals]


def test_wav_features_match_hand_computation():
    import math

    from briefly_spark.operators.multimodal import _load_decoder, wav_decode_pcm

    dims = 4
    samples = [((i * 311) % 2001) - 1000 for i in range(32)]
    blob = _wav_bytes([samples])
    _, _, mono = wav_decode_pcm(blob)
    assert mono == samples
    feats = _load_decoder("wav", dims)([blob])[0]
    expected = [
        math.sqrt(sum(s * s for s in samples[d * 8 : (d + 1) * 8]) / 8) / 32768.0 - 0.5
        for d in range(dims)
    ]
    assert feats == expected


def test_wav_decode_rejects_non_wav_and_exotic_variants():
    import struct

    import pytest

    from briefly_spark.operators.multimodal import wav_decode_pcm

    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode_pcm(b"OggS....")
    # float PCM (fmt code 3) is out of scope and must fail loudly
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported"):
        wav_decode_pcm(blob)


# ---------------------------------------------------------------------------
# OpenAI summarize seam (operators/summarize.py M5 `openai` backend)
# ---------------------------------------------------------------------------
def _fake_async_openai(responses: dict[str, str | None]) -> types.ModuleType:
    """AsyncOpenAI mock honoring the recorded sdk call shape: await
    client.chat.completions.create(messages=..., model=..., temperature=...,
    max_tokens=...) -> resp.choices[0].message.content.  ``responses`` maps
    user text -> content (None simulates a persistent empty reply)."""
    import asyncio

    mod = types.ModuleType("openai")
    calls = []

    class _Msg:
        def __init__(self, content):
            self.content = content

    class _Choice:
        def __init__(self, content):
            self.message = _Msg(content)

    class _Resp:
        def __init__(self, content):
            self.choices = [_Choice(content)]

    class _Completions:
        async def create(self, *, messages, model, temperature, max_tokens):
            assert temperature == 0.4 and max_tokens == 225
            assert messages[0]["role"] == "system"
            calls.append(messages[1]["content"])
            await asyncio.sleep(0)
            return _Resp(responses[messages[1]["content"]])

    class _Chat:
        def __init__(self):
            self.completions = _Completions()

    class AsyncOpenAI:
        def __init__(self):
            self.chat = _Chat()
            mod._clients.append(self)
            self.closed = False

        async def close(self):
            self.closed = True

    mod.AsyncOpenAI = AsyncOpenAI
    mod._calls = calls
    mod._clients = []
    return mod


def test_openai_summarize_backend_runs_with_mock(clean_modules, monkeypatch):
    from briefly_spark.operators import summarize as sz

    monkeypatch.setattr(sz, "_SUMMARIZE_RETRIES", 2)
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    mod = _fake_async_openai(
        {"doc one": "ý 1\ný 2\ný 3\ný 4", "doc two": None}
    )
    clean_modules("openai", mod)
    fn = sz._load_summarize_backend("openai")
    outs = fn(["doc one", "doc two"])
    assert outs[0] == "ý 1\ný 2\ný 3\ný 4"
    assert outs[1] is None  # empty reply exhausts retries -> fallback marker
    # retries: doc two attempted _SUMMARIZE_RETRIES times, doc one once
    assert mod._calls.count("doc two") == 2 and mod._calls.count("doc one") == 1
    # a SECOND batch gets a fresh client inside its own event loop —
    # review r13: a client shared across asyncio.run() loops dies with
    # the first loop and every later batch degraded to fallback
    outs2 = fn(["doc one"])
    assert outs2 == ["ý 1\ný 2\ný 3\ný 4"]
    # ADVICE r14: every per-batch client is closed before its loop exits
    # (an open httpx pool at loop teardown leaks connections/FDs on
    # long-running executors)
    assert len(mod._clients) == 2 and all(c.closed for c in mod._clients)


def test_openai_summarize_backend_gated_without_lib(monkeypatch, clean_modules):
    from briefly_spark.operators.summarize import _load_summarize_backend

    assert "openai" not in sys.modules
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    with pytest.raises(NotImplementedError):
        _load_summarize_backend("openai")
    with pytest.raises(ValueError):
        _load_summarize_backend("nope")
    # sdk present but key absent must raise the SAME seam signal
    # (review r13), not an opaque sdk error inside mapInPandas
    clean_modules("openai", _fake_async_openai({}))
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(NotImplementedError, match="OPENAI_API_KEY"):
        _load_summarize_backend("openai")


# ---------------------------------------------------------------------------
# Serper+Groq fact-check seam (operators/summarize.py M6 backend)
# ---------------------------------------------------------------------------
def _fake_requests(organic_by_query: dict[str, int]) -> types.ModuleType:
    mod = types.ModuleType("requests")

    class _Resp:
        def __init__(self, n):
            self._n = n

        def raise_for_status(self):
            pass

        def json(self):
            return {"organic": [{"title": f"r{i}"} for i in range(self._n)]}

    def get(url, *, headers, params, timeout):
        assert "serper" in url and headers["X-API-KEY"] == "sk-serper"
        assert params["gl"] == "vn" and params["tbs"] == "qdr:d"
        return _Resp(organic_by_query.get(params["q"], 0))

    mod.get = get
    return mod


def _fake_sync_openai(statuses: list[str]) -> types.ModuleType:
    """OpenAI-compatible (Groq) chat mock returning a structured
    fact-check JSON with the given per-statement statuses."""
    import json

    mod = types.ModuleType("openai")

    class _Msg:
        def __init__(self, content):
            self.content = content

    class _Choice:
        def __init__(self, content):
            self.message = _Msg(content)

    class _Resp:
        def __init__(self, content):
            self.choices = [_Choice(content)]

    class _Completions:
        def create(self, *, model, messages, response_format):
            assert response_format == {"type": "json_object"}
            body = {
                "result": [
                    {"statement": f"s{i}", "status": s, "explanation": "",
                     "suggested_keywords": []}
                    for i, s in enumerate(statuses)
                ]
            }
            return _Resp(json.dumps(body))

    class _Chat:
        def __init__(self):
            self.completions = _Completions()

    class OpenAI:
        def __init__(self, *, base_url=None, api_key=None):
            assert base_url and "groq" in base_url
            self.chat = _Chat()

    mod.OpenAI = OpenAI
    return mod


def test_serper_groq_factcheck_backend_runs_with_mock(clean_modules, monkeypatch):
    from briefly_spark.operators.summarize import _load_factcheck_backend

    monkeypatch.setenv("SERPER_API_KEY", "sk-serper")
    monkeypatch.setenv("GROQ_API_KEY", "sk-groq")
    full = "đủ kết quả " * 20
    sparse = "ít kết quả"
    clean_modules(
        "requests", _fake_requests({full[:100]: 10, sparse[:100]: 4})
    )
    # 6 confirmed, 2 refuted, 2 other -> ((6 - 1)/10)*10 = 5
    clean_modules(
        "openai",
        _fake_sync_openai(["confirmed"] * 6 + ["refuted"] * 2 + ["vague"] * 2),
    )
    fn = _load_factcheck_backend("serper_groq")
    scores = fn([full, sparse])
    assert scores[0] == 5      # the A6 formula over the mocked verdicts
    assert scores[1] == 1      # <5 results -> deterministic bucket 1


def test_serper_groq_factcheck_gated_without_keys(clean_modules, monkeypatch):
    from briefly_spark.operators.summarize import _load_factcheck_backend

    clean_modules("requests", _fake_requests({}))
    clean_modules("openai", _fake_sync_openai([]))
    monkeypatch.delenv("SERPER_API_KEY", raising=False)
    monkeypatch.delenv("GROQ_API_KEY", raising=False)
    with pytest.raises(NotImplementedError):
        _load_factcheck_backend("serper_groq")
    with pytest.raises(ValueError):
        _load_factcheck_backend("nope")


def test_summarize_and_factcheck_stub_paths_match_column_exprs(spark):
    """The DataFrame contract's 'stub' route is the SAME surface q61/q62
    hash — value-compare against the raw Column expressions."""
    from pyspark.sql import functions as F

    from briefly_spark.operators.summarize import (
        factcheck_articles,
        factcheck_score,
        summarize_articles,
        summary_bullets,
        summary_status,
    )

    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten eleven twelve"),
         (2, "short"),
         (3, " ".join(f"w{i}" for i in range(60)))],
        "id LONG, text STRING",
    )
    got = sorted(
        tuple(r)
        for r in summarize_articles(df, "text", "id", backend="stub").collect()
    )
    want = sorted(
        tuple(r)
        for r in df.select(
            "id",
            summary_bullets(F.col("text")).alias("summary"),
            summary_status(F.col("text")).alias("summary_status"),
        ).collect()
    )
    assert got == want
    got_fc = sorted(
        tuple(r)
        for r in factcheck_articles(df, "text", "id", backend="stub").collect()
    )
    want_fc = sorted(
        tuple(r)
        for r in df.select(
            "id", factcheck_score(F.col("text")).cast("double").alias("validation_score")
        ).collect()
    )
    assert got_fc == want_fc


def test_serper_groq_per_row_error_falls_back_to_two(clean_modules, monkeypatch):
    """Review r13: one transient search failure must not kill the Spark
    task — the reference's per-article error fallback is score 2."""
    from briefly_spark.operators.summarize import _load_factcheck_backend

    monkeypatch.setenv("SERPER_API_KEY", "sk-serper")
    monkeypatch.setenv("GROQ_API_KEY", "sk-groq")
    mod = types.ModuleType("requests")

    def get(url, *, headers, params, timeout):
        raise ConnectionError("serper down")

    mod.get = get
    clean_modules("requests", mod)
    clean_modules("openai", _fake_sync_openai([]))
    fn = _load_factcheck_backend("serper_groq")
    assert fn(["bất kỳ"]) == [2.0]


def test_serper_groq_scores_are_floats_like_the_stub(clean_modules, monkeypatch):
    """Review r13: the live path must keep the stub's fractional scale —
    int() truncation made a backend swap a silent coarsening."""
    from briefly_spark.operators.summarize import _load_factcheck_backend

    monkeypatch.setenv("SERPER_API_KEY", "sk-serper")
    monkeypatch.setenv("GROQ_API_KEY", "sk-groq")
    full = "đầy đủ " * 30
    clean_modules("requests", _fake_requests({full[:100]: 10}))
    # 2 confirmed, 1 refuted, 1 vague -> ((2 - 0.5)/4)*10 = 3.75
    clean_modules(
        "openai", _fake_sync_openai(["confirmed", "confirmed", "refuted", "vague"])
    )
    fn = _load_factcheck_backend("serper_groq")
    assert fn([full]) == [3.75]


def test_openai_summarize_config_errors_fail_fast(clean_modules, monkeypatch):
    """Review r13 pass 2: auth/permission/4xx errors affect every row —
    the backend must raise loudly instead of burning the retry ladder
    per row and returning a 'successful' all-fallback batch."""
    import asyncio

    from briefly_spark.operators import summarize as sz

    monkeypatch.setenv("OPENAI_API_KEY", "sk-bad")
    mod = types.ModuleType("openai")
    calls = []

    class AuthenticationError(Exception):
        pass

    class _Completions:
        async def create(self, **kw):
            calls.append(1)
            await asyncio.sleep(0)
            raise AuthenticationError("invalid key")

    class _Chat:
        def __init__(self):
            self.completions = _Completions()

    class AsyncOpenAI:
        def __init__(self):
            self.chat = _Chat()

        async def close(self):
            pass

    mod.AsyncOpenAI = AsyncOpenAI
    clean_modules("openai", mod)
    fn = sz._load_summarize_backend("openai")
    with pytest.raises(AuthenticationError):
        fn(["doc one", "doc two"])
    # no retry ladder on a config error: at most one attempt per row
    assert len(calls) <= 2


def test_is_config_error_exempts_transient_4xx():
    """ADVICE r14 (medium): 429 rate-limit and 408 timeout are TRANSIENT
    despite being 4xx — classifying them as config errors kills the task
    under load, skipping the retry ladder / per-row fallback and
    re-billing the whole batch on task retry."""
    from briefly_spark.operators.summarize import _is_config_error

    class _Resp:
        def __init__(self, status):
            self.status_code = status

    def http_exc(status):
        e = Exception(str(status))
        e.response = _Resp(status)
        return e

    assert _is_config_error(http_exc(403))
    assert _is_config_error(http_exc(404))
    assert not _is_config_error(http_exc(429))
    assert not _is_config_error(http_exc(408))
    assert not _is_config_error(http_exc(500))

    class RateLimitError(Exception):
        pass

    class AuthenticationError(Exception):
        pass

    # sdk classes are matched by NAME (no sdk import at module load);
    # RateLimitError is transient even when its response carries a 429
    rl = RateLimitError("rate limited")
    rl.response = _Resp(429)
    assert not _is_config_error(rl)
    assert _is_config_error(AuthenticationError("bad key"))


def test_openai_summarize_429_follows_transient_path(clean_modules, monkeypatch):
    """A rate-limited batch must run the retry ladder and land on the
    per-row fallback (None), never raise out of the Spark task."""
    import asyncio

    from briefly_spark.operators import summarize as sz

    monkeypatch.setattr(sz, "_SUMMARIZE_RETRIES", 2)
    monkeypatch.setattr(asyncio, "sleep", _instant_sleep(asyncio))
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    mod = types.ModuleType("openai")
    calls = []

    class RateLimitError(Exception):
        def __init__(self):
            super().__init__("429")
            self.response = types.SimpleNamespace(status_code=429)

    class _Completions:
        async def create(self, **kw):
            calls.append(1)
            await asyncio.sleep(0)
            raise RateLimitError()

    class AsyncOpenAI:
        def __init__(self):
            self.chat = types.SimpleNamespace(completions=_Completions())

        async def close(self):
            pass

    mod.AsyncOpenAI = AsyncOpenAI
    clean_modules("openai", mod)
    fn = sz._load_summarize_backend("openai")
    assert fn(["doc one"]) == [None]  # fallback marker, task alive
    assert len(calls) == 2  # the full retry ladder ran


def _instant_sleep(asyncio_mod):
    real = asyncio_mod.sleep

    async def fake(t):
        await real(0)

    return fake


def test_serper_groq_429_falls_back_per_row(clean_modules, monkeypatch):
    """A Serper 429 (surfaced via raise_for_status) is load, not
    configuration: the per-row score-2 fallback applies (ADVICE r14)."""
    from briefly_spark.operators.summarize import _load_factcheck_backend

    monkeypatch.setenv("SERPER_API_KEY", "sk-serper")
    monkeypatch.setenv("GROQ_API_KEY", "sk-groq")
    mod = types.ModuleType("requests")

    class HTTPError(Exception):
        def __init__(self):
            super().__init__("429 Too Many Requests")
            self.response = types.SimpleNamespace(status_code=429)

    def get(url, *, headers, params, timeout):
        raise HTTPError()

    mod.get = get
    clean_modules("requests", mod)
    clean_modules("openai", _fake_sync_openai([]))
    fn = _load_factcheck_backend("serper_groq")
    assert fn(["bất kỳ"]) == [2.0]


def test_live_path_id_column_validated_at_api_boundary(spark):
    """ADVICE r14: the live mapInPandas schema derives from the id
    column's actual type — string ids pass through, integral ids widen
    to long, anything else raises HERE (driver, clear message), not deep
    inside an executor."""
    from briefly_spark.operators.summarize import (
        _id_field,
        factcheck_articles,
        summarize_articles,
    )

    df_long = spark.createDataFrame([(1, "t")], "id LONG, text STRING")
    df_int = spark.createDataFrame([(1, "t")], "id INT, text STRING")
    df_str = spark.createDataFrame([("a", "t")], "id STRING, text STRING")
    df_dec = spark.createDataFrame([(1.5, "t")], "id DOUBLE, text STRING")
    assert _id_field(df_long, "id") == ("long", "int64")
    assert _id_field(df_int, "id") == ("long", "int64")
    assert _id_field(df_str, "id") == ("string", None)
    with pytest.raises(TypeError, match="id column 'id' has type double"):
        _id_field(df_dec, "id")
    # the operator surfaces raise eagerly on the driver, before any
    # backend/sdk loading (which happens inside the executor generator)
    with pytest.raises(TypeError, match="integral or string"):
        summarize_articles(df_dec, "text", "id", backend="openai")
    with pytest.raises(TypeError, match="integral or string"):
        factcheck_articles(df_dec, "text", "id", backend="serper_groq")
    # string ids build a valid plan with a string id field
    plan = summarize_articles(df_str, "text", "id", backend="openai")
    assert dict(plan.dtypes)["id"] == "string"


def test_serper_groq_config_error_fails_fast(clean_modules, monkeypatch):
    """A 4xx from the search endpoint (bad key / rejected call shape)
    must raise, not mask as per-row 2.0 fallback."""
    from briefly_spark.operators.summarize import _load_factcheck_backend

    monkeypatch.setenv("SERPER_API_KEY", "sk-wrong")
    monkeypatch.setenv("GROQ_API_KEY", "sk-groq")
    mod = types.ModuleType("requests")

    class _Resp:
        status_code = 403

    class HTTPError(Exception):
        def __init__(self):
            super().__init__("403")
            self.response = _Resp()

    def get(url, *, headers, params, timeout):
        raise HTTPError()

    mod.get = get
    clean_modules("requests", mod)
    clean_modules("openai", _fake_sync_openai([]))
    fn = _load_factcheck_backend("serper_groq")
    with pytest.raises(Exception, match="403"):
        fn(["bất kỳ"])
