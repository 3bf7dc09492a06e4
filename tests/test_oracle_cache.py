"""The parity harness's oracle disk cache must be semantics-free: a
cached multiset must equal the freshly-computed one bit for bit, the
cache key must roll over when the oracle SQL changes, and disabling
the cache must bypass it entirely.  DuckDB-only — no Spark session.
"""

from __future__ import annotations

import glob
import os
import time

from .parity import _CACHE_DIR, _cache_enabled, oracle_multiset

SF_DIR = "/root/testdata/sf0.001"
SQL = (
    "SELECT r_regionkey, COUNT(*) AS n FROM region GROUP BY 1"
)


def _cache_files(key: str) -> list[str]:
    return glob.glob(os.path.join(_CACHE_DIR, f"{key}.*.pkl"))


def test_cached_multiset_is_bitwise_equal_to_fresh(monkeypatch):
    key = "_test_oracle_cache_demo"
    for p in _cache_files(key):
        os.remove(p)
    fresh = oracle_multiset(SF_DIR, key, SQL)
    assert _cache_files(key), "first call must populate the cache"
    cached = oracle_multiset(SF_DIR, key, SQL)
    assert fresh == cached
    cols, n, ms = cached
    assert cols == ["n", "r_regionkey"]
    assert n == sum(ms.values()) == len(ms)
    for p in _cache_files(key):
        os.remove(p)


def test_cache_key_rolls_over_when_sql_changes():
    # Distinct SQL must not reuse the old entry, AND an AGED-OUT old
    # entry is evicted on write so the dir stays bounded (ADVICE r8);
    # a YOUNG sibling survives — it is likely a concurrent test
    # process on a different revision, and deleting it would thrash
    # both caches (ADVICE r9).
    from . import parity

    key = "_test_oracle_cache_roll"
    for p in _cache_files(key):
        os.remove(p)
    oracle_multiset(SF_DIR, key, SQL)
    first = _cache_files(key)
    assert len(first) == 1
    sql2 = SQL + " HAVING COUNT(*) > 0"
    fresh2 = oracle_multiset(SF_DIR, key, sql2)
    second = _cache_files(key)
    assert len(second) == 2, "young sibling must survive (concurrency)"
    assert first[0] in second, "young sibling must survive (concurrency)"
    # Age the first entry past the eviction horizon; the next write
    # of the sql2 revision must then sweep it.
    old = time.time() - parity._EVICT_MIN_AGE_S - 60
    os.utime(first[0], (old, old))
    os.remove([p for p in second if p != first[0]][0])
    assert oracle_multiset(SF_DIR, key, sql2) == fresh2
    third = _cache_files(key)
    assert len(third) == 1, "aged-out sibling entries must be evicted"
    assert first[0] not in third
    for p in _cache_files(key):
        os.remove(p)


def test_cache_key_rolls_over_when_normalization_changes(monkeypatch):
    # ADVICE r8: cached values embed norm_cell/to_multiset behavior —
    # editing either must roll the cache key over automatically.
    from . import parity

    key = "_test_oracle_cache_normroll"
    for p in _cache_files(key):
        os.remove(p)
    oracle_multiset(SF_DIR, key, SQL)
    first = _cache_files(key)
    monkeypatch.setattr(
        parity, "_norm_version", lambda: "simulated-new-normalization"
    )
    oracle_multiset(SF_DIR, key, SQL)
    second = _cache_files(key)
    assert second != first, "normalization change must invalidate the entry"
    for p in _cache_files(key):
        os.remove(p)


def test_cache_disabled_by_env_and_for_tmp_dirs(monkeypatch, tmp_path):
    monkeypatch.setenv("BDT_ORACLE_CACHE", "0")
    assert not _cache_enabled(SF_DIR)
    monkeypatch.delenv("BDT_ORACLE_CACHE")
    assert _cache_enabled(SF_DIR)
    # tmp_path fixture dirs regenerate per run — never cached
    assert not _cache_enabled(str(tmp_path))
