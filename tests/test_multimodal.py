"""Multimodal kernel gates.

The worker-side `_meta` closure inside multimodal_fake_decode is
intentionally inlined (a module-global reference pickles by reference
and breaks when workers can't import the package); this parity test
pins it to the module-level `fake_decode_meta` so the two can't drift
apart silently (ADVICE r1).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_fake_decode_matches_module_kernel(spark):
    from projetbigdata_spark.multimodal.binaryops import (
        fake_decode_meta,
        multimodal_fake_decode,
    )
    from projetbigdata_spark.sources.catalog import load_table

    got = {
        r.doc_id: (r.width, r.height, r.format)
        for r in multimodal_fake_decode(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = {
        r.doc_id: fake_decode_meta(r.text.encode("utf-8"))
        for r in docs.collect()
    }
    assert got == expected
    assert len(got) > 0


def test_decode_image_is_documented_stub():
    from projetbigdata_spark.multimodal.binaryops import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
