"""Quick driver-gate-style parity check for named queries at sf0.01.

Usage: python tests/parity_quick.py q1 q2 ...  (dev tool, not a pytest)
Mirrors the driver compare: row count, sorted column names, and an
order-insensitive stringified row comparison.
"""

import sys

import duckdb

sys.path.insert(0, ".")

from kinesis_stream_consumer_spark.plans import QUERIES  # noqa: E402
from kinesis_stream_consumer_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def main(names):
    spark = get_spark("parity-quick")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        q = QUERIES[name]
        try:
            sdf = q.fn(spark, SF).toPandas()
            if q.oracle is None:
                print(f"{name}: rows-only, spark rows={len(sdf)}")
                continue
            odf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:500]}")
            failures += 1
            continue
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        s = sdf[sorted(sdf.columns)].astype(str)
        o = odf[sorted(odf.columns)].astype(str)
        sv = sorted(map(tuple, s.values.tolist()))
        ov = sorted(map(tuple, o.values.tolist()))
        ok_vals = sv == ov
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)}"
            f" cols={'ok' if ok_cols else (sorted(sdf.columns), sorted(odf.columns))}"
        )
        if not ok_vals and ok_cols and ok_rows:
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            for a, b in diffs:
                print("  spark:", a)
                print("  duck :", b)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
