"""Optional-Pillow codec routing (round-4 verdict item #5): when
Pillow is importable in the worker, extract_features/resize_images
decode real images through PIL; otherwise (this container) every
byte-string takes the deterministic stub — same oracle contract as
round 3.

Pillow is NOT installed here, so the real-codec branch is exercised
by shipping a minimal ``PIL.Image`` stand-in to the workers via
``SparkContext.addPyFile`` (mapInPandas runs in separate Python
worker processes — a driver-side monkeypatch would never reach
them). The stand-in implements exactly the surface the operator
calls: ``Image.open`` -> context manager with width/height/
thumbnail/save. The stub path is additionally pinned byte-for-byte
against the round-3 contract; the driver-gate queries pin
``use_pil=False`` so they stay oracle-green in ANY environment.

NOTE: addPyFile is session-sticky — the fake PIL stays importable on
this Spark session's workers after these tests. That is safe: every
other consumer either pins use_pil=False or feeds bytes the fake
format cannot decode (falls back to the stub).
"""

from __future__ import annotations

import os
import zipfile

import pytest

from flyscrape_spark.operators.multimodal import (
    _fake_decode,
    _load_pil,
    extract_features,
    resize_images,
)

# the stand-in's image format: b"IMG!" + width byte + height byte
MAGIC = b"IMG!"

_FAKE_PIL_IMAGE_SRC = '''
MAGIC = b"IMG!"


class _FakeImage:
    def __init__(self, raw):
        if not raw.startswith(MAGIC) or len(raw) < 6:
            raise ValueError("not a fake image")
        self.width, self.height = raw[4], raw[5]

    def thumbnail(self, size):
        # PIL semantics: in-place aspect-preserving downscale only
        mx = min(size)
        longest = max(self.width, self.height)
        if longest <= mx:
            return
        self.width = max(self.width * mx // longest, 1)
        self.height = max(self.height * mx // longest, 1)

    def save(self, buf, format=None):
        buf.write(MAGIC + bytes([self.width, self.height]) + b"PNG")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def open(fp):
    return _FakeImage(fp.read())
'''


@pytest.fixture(scope="module")
def fake_pil(spark, tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("fakepil") / "fake_pil.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("PIL/__init__.py", "from . import Image\n")
        z.writestr("PIL/Image.py", _FAKE_PIL_IMAGE_SRC)
    spark.sparkContext.addPyFile(zpath)
    return zpath


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_ref string, content binary")


def test_pil_absent_in_container():
    # this container ships no codecs: driver-side auto-detect is None
    # (MUST run before the fake_pil fixture installs the stand-in)
    if "PIL" not in __import__("sys").modules and not any(
        os.path.exists(os.path.join(p, "PIL"))
        for p in __import__("sys").path if isinstance(p, str) and p
        and os.path.isdir(p)
    ):
        assert _load_pil() is None


def test_use_pil_true_without_pillow_raises(spark):
    media = _media(spark, [("m", b"abcd")])
    with pytest.raises(Exception, match="Pillow"):
        extract_features(media, use_pil=True).collect()


def test_stub_path_contract_unchanged(spark):
    """use_pil=False reproduces the round-3 deterministic contract
    (the DuckDB oracle's model) byte-for-byte."""
    raw = b"hello!"  # even length -> image; dims from bytes 0-1
    media = _media(spark, [("m", raw)])
    row = extract_features(media, use_pil=False).collect()[0]
    kind, w, h = _fake_decode(raw)
    assert (row["kind_guess"], row["width"], row["height"]) == (kind, w, h)
    assert row["byte_len"] == len(raw)
    rrow = resize_images(media, max_dim=24, use_pil=False).collect()[0]
    assert (rrow["width"], rrow["height"]) == (w, h)
    longest = max(w, h)
    ow = max(w * 24 // longest, 1) if longest > 24 else w
    oh = max(h * 24 // longest, 1) if longest > 24 else h
    assert (rrow["out_width"], rrow["out_height"]) == (ow, oh)
    assert bytes(rrow["content"]) == raw[: ow + oh]


def test_real_codec_path_with_fake_pillow(spark, fake_pil):
    """With PIL importable on the workers, decodable images take the
    real path (true dims, thumbnail resize, re-encoded payload) while
    undecodable bytes still fall back to the stub in the same batch."""
    img = MAGIC + bytes([120, 40]) + b"data"
    junk = b"not-an-image!!"  # even -> stub kind 'image'
    media = _media(spark, [("img", img), ("junk", junk)])

    feats = {r["media_ref"]: r
             for r in extract_features(media, use_pil=True).collect()}
    assert (feats["img"]["width"], feats["img"]["height"]) == (120, 40)
    assert feats["img"]["kind_guess"] == "image"
    k, w, h = _fake_decode(junk)
    assert (feats["junk"]["kind_guess"], feats["junk"]["width"],
            feats["junk"]["height"]) == (k, w, h)

    sized = {r["media_ref"]: r
             for r in resize_images(media, max_dim=24,
                                    use_pil=True).collect()}
    r = sized["img"]
    # 120x40 -> thumbnail((24, 24)): 24x8
    assert (r["width"], r["height"]) == (120, 40)
    assert (r["out_width"], r["out_height"]) == (24, 8)
    assert bytes(r["content"]) == MAGIC + bytes([24, 8]) + b"PNG"
    # junk row took the stub math in the same batch
    j = sized["junk"]
    assert (j["width"], j["height"]) == (w, h)


def test_auto_detect_uses_pil_when_present(spark, fake_pil):
    img = MAGIC + bytes([10, 10]) + b"x"
    media = _media(spark, [("img", img)])
    row = extract_features(media).collect()[0]  # use_pil=None
    assert (row["width"], row["height"]) == (10, 10)


def test_stub_pin_survives_pil_presence(spark, fake_pil):
    """The driver-gate contract: use_pil=False ignores an installed
    Pillow entirely — decodable image bytes still take the stub."""
    img = MAGIC + bytes([120, 40]) + b"xy"  # 10 bytes, even
    media = _media(spark, [("img", img)])
    row = extract_features(media, use_pil=False).collect()[0]
    k, w, h = _fake_decode(img)
    assert (row["kind_guess"], row["width"], row["height"]) == (k, w, h)


def test_report_real_codec_path_availability():
    """Honesty ratchet (round-4 verdict item #8): SKIPS loudly when
    Pillow is absent, so every pytest run's ``-ra`` summary states in
    plain text which codec path this environment's media evidence
    used. In a real-codec environment this test instead asserts the
    PIL route is live."""
    import subprocess
    import sys

    # fresh interpreter: the fake PIL zip the tests above addPyFile'd
    # onto THIS process's sys.path must not masquerade as a real codec
    probe = subprocess.run(
        [sys.executable, "-c",
         "from flyscrape_spark.operators.multimodal import _load_pil; "
         "import sys; sys.exit(0 if _load_pil() is None else 7)"],
        cwd="/root/repo", capture_output=True, timeout=60,
    )
    if probe.returncode == 0:
        pytest.skip(
            "CODEC PATH = STUB: Pillow is not installed in this "
            "container, so ALL media decode evidence this round "
            "(media_features/media_resize/media_frames/media_dedup) "
            "ran the deterministic stub; the PIL route is exercised "
            "only via the shipped fake (tests above)"
        )
    assert probe.returncode == 7  # real Pillow: auto-routing is live
