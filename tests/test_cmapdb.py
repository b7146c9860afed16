"""Predefined CMap database invariants — the reference's CVE-2025-64512
security tests re-asserted (tests/test_cmapdb_security.py there): JSON-
sourced tables with integer-keyed code tries and correct unicode maps.
Our resources are JSON-native by construction (never pickle), so these
lock in the same loading guarantees."""

from pdfminer_six_spark.core.cmaps import CMapDB, CMapNotFound

import pytest


def test_predefined_cmap_loads():
    cmap = CMapDB.get_cmap("H")
    assert cmap is not None

    def check_keys(d):
        if isinstance(d, dict):
            for k, v in d.items():
                assert isinstance(k, int), f"expected int key, got {k!r}"
                check_keys(v)

    check_keys(cmap.code2cid)


def test_unicode_map_loads():
    umap = CMapDB.get_unicode_map("Adobe-Japan1", vertical=False)
    assert isinstance(umap.cid2unichr, dict)
    assert umap.cid2unichr[1] == " "
    assert all(isinstance(k, int) for k in umap.cid2unichr)


def test_unknown_cmap_raises():
    with pytest.raises(CMapNotFound):
        CMapDB.get_cmap("No-Such-CMap-Exists")
