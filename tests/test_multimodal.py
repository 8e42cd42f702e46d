"""Multimodal decode-path tests (VERDICT r2 item 7).

The container has no PIL by design, so the real `decode_image` path is
exercised behind a skipif — the day the environment gains PIL, the test
runs and proves the path; until then the stub contract (explicit
NotImplementedError) and the deterministic stand-in are pinned.
"""

from __future__ import annotations

import pytest

from naqed_spark.functions.multimodal import (
    HAVE_PIL,
    decode_image,
    fake_features,
)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL absent from container (stub path)")
def test_decode_image_real_path():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="PNG")
    img = decode_image(buf.getvalue())
    assert img.size == (4, 3)


@pytest.mark.skipif(HAVE_PIL, reason="PIL present; stub branch unreachable")
def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_fake_features_deterministic():
    # the stand-in the mapInPandas plumbing runs: byte length, first octet
    # (-1 for empty), 256-byte frame count, multiplicative hash
    assert fake_features(7, b"") == (7, 0, -1, 1, 0)
    assert fake_features(1, b"abc") == (1, 3, 97, 1, (3 * 2654435761) % 1000003)
