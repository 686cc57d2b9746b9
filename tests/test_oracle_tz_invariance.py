"""Every oracle must be timezone-invariant: the drivers never pin
DuckDB's SESSION TimeZone, so any oracle whose result depends on it
(e.g. a TIMESTAMPTZ→TIMESTAMP cast from to_timestamp) silently
diverges on non-UTC machines. r3 caught exactly one such oracle
(events_sliding_15m_5m); this sweep keeps the property for every
future oracle. DuckDB-only — no Spark session, runs in seconds."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from projetbigdata_spark import registry
from tests.conftest import SF_CHECK

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_, ORACLES = registry.collect()


def _run_all(tz: str) -> dict[str, str]:
    con = duckdb.connect()
    con.execute(f"SET TimeZone='{tz}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CHECK}/{t}.parquet')"
        )
    out = {}
    for name, sql in ORACLES.items():
        df = con.execute(sql).df()
        cols = sorted(df.columns)
        h = hashlib.sha256()
        for row in sorted(map(str, df[cols].itertuples(index=False))):
            h.update(row.encode())
        out[name] = h.hexdigest()
    con.close()
    return out


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Tokyo"])
def test_every_oracle_is_timezone_invariant(tz):
    utc = _run_all("UTC")
    other = _run_all(tz)
    drifted = sorted(n for n in utc if utc[n] != other[n])
    assert not drifted, (
        f"oracles shift under TimeZone={tz}: {drifted} — see the "
        "to_timestamp gotcha in .claude/skills/verify/SKILL.md"
    )
