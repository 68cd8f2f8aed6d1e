"""Order-insensitive Spark-vs-DuckDB comparison used across tests.

Same canonicalization as tools/verify_local.py: columns sorted by
name, rows sorted by stringified tuple, floats to 6 significant
digits, timestamps to ISO-micros.
"""

from __future__ import annotations

import datetime
import math


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        # Type-distinct like the driver: float 1.0 must NOT canonicalize
        # to the same string as int 1 (see tools/verify_local.py).
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0:
            return "0.0"
        s = f"{v:.6g}"
        if "." not in s and "e" not in s:
            s += ".0"
        return s
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_same(sdf, duck_con, sql: str):
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck_con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns {sorted(scols)} != {sorted(dcols)}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
    assert a == b, next(
        f"row {i}:\n spark={x}\n duck ={y}" for i, (x, y) in enumerate(zip(a, b)) if x != y
    )
