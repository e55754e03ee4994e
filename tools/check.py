#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify's output dir,
runs each oracle SQL in DuckDB against the same sf parquet tables, and
compares (schema by sorted column name, values order-insensitively AND
order-sensitively so we know if ORDER BY drifted). Dev tool only — the
shipped Scala code never depends on this."""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v): rr.append("NaN")
                else: rr.append(round(v, 6))
            else: rr.append(str(v))
        out.append(tuple(rr))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no Spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                "SELECT " + ",".join(f'"{c}"' for c in got_cols) +
                f" FROM read_parquet({files!r})").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                "SELECT " + ",".join(f'"{c}"' for c in exp_cols) +
                f" FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}"); n_fail += 1; continue
        g, e = canon(got_rows), canon(exp_rows)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        elif sorted(g) == sorted(e):
            print(f"WARN {name}: values match but ROW ORDER differs"); n_fail += 1
        else:
            gs, es = set(g), set(e)
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; "
                  f"spark-only={list(gs-es)[:3]} oracle-only={list(es-gs)[:3]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
