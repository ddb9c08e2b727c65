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
