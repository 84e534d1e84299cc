"""Driver-style comparison: row count + sorted-column schema + exact
order-insensitive multiset of values.  Stricter than a hash — on
mismatch it shows the first differing rows."""

from __future__ import annotations

import datetime
import decimal
import math


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and v == 0.0:
        return 0.0  # normalize -0.0
    return v


def rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    out = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=repr,
    )
    return names, out


def compare_query(spark, duck, sf_dir, name):
    """Run Spark query + DuckDB oracle, assert driver-style equality."""
    from ema_bigdata_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    ores = duck.execute(ORACLES[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} (spark) != {len(orows)} (oracle)"
    )
    sn, sset = rowset(scols, [tuple(r) for r in srows])
    on, oset = rowset(ocols, orows)
    assert sn == on, f"{name}: columns {sn} != {on}"
    if sset != oset:
        diffs = [
            (a, b) for a, b in zip(sset, oset) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")
