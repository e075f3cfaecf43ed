#!/usr/bin/env python3
"""Dev-only pre-validation of SparkEntry oracles against DuckDB.

Mimics the driver's t2 gate: run graft.Verify to dump each query's result
as parquet + oracle_sql.json, then execute each oracle in DuckDB over the
same sf dir and compare (columns sorted by name, rows sorted by all
columns, exact for non-floats, tolerant + max-rel-diff report for floats).

Usage: python3 tools/check.py [sfDir] [outDir] [--no-verify] [names...]
"""
import json, math, subprocess, sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                              else (json.dumps(v, sort_keys=True, default=str) if isinstance(v, (dict, list)) else v))
        # tz-aware → naive UTC for comparison
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    # sort rows with non-float columns FIRST: each engine sorts by its
    # own float sums, which differ in the last ulp, so a float used as
    # a tie-break key interleaves tie blocks differently per engine and
    # misaligns the exact columns positionally (seen on q16 at sf1:
    # identical row sets, 1962 user_id "diffs" under name-order sort, 0
    # under non-float-first). Floats still participate (last) so rows
    # not keyed by the exact columns stay nearly aligned for the
    # tolerant compare.
    cols = list(df.columns)
    key = ([c for c in cols if not str(df[c].dtype).startswith("float")]
           + [c for c in cols if str(df[c].dtype).startswith("float")])
    df = df.sort_values(by=key, key=lambda s: s.map(str) if s.dtype == object else s)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} duck={len(b)}"
    issues, max_rel = [], 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            diff = ~np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-12) & ~both_nan
            if diff.any():
                issues.append(f"{c}: {int(diff.sum())} float diffs e.g. {av[diff].iloc[0]} vs {bv[diff].iloc[0]}")
            with np.errstate(all="ignore"):
                rel = np.abs(av.fillna(0) - bv.fillna(0)) / np.maximum(np.abs(bv.fillna(0)), 1e-300)
            m = float(np.nanmax(rel)) if len(rel) else 0.0
            max_rel = max(max_rel, 0.0 if math.isnan(m) else m)
        else:
            av2 = av.map(str) if av.dtype == object else av
            bv2 = bv.map(str) if bv.dtype == object else bv
            neq = ~(av2.eq(bv2) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(np.argmax(neq.values))
                issues.append(f"{c}: {int(neq.sum())} diffs e.g. row{i} {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    if issues:
        return "FAIL " + "; ".join(issues[:3])
    bits = "bit-exact" if max_rel == 0.0 else f"max_rel={max_rel:.2e}"
    return f"OK rows={len(a)} {bits}"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    names = args[2:]
    if "--no-verify" not in sys.argv:
        # forward any name subset to Verify so a dev iteration on one
        # new query doesn't pay the full registry (driver runs are
        # always nameless → full registry, tamper-evidence intact)
        extra = ("" if not names else " " + " ".join(names))
        r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf} {out}{extra}'],
                           cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
        if r.returncode != 0:
            print(tail); sys.exit(1)
        for line in (r.stdout + r.stderr).splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    # Tamper-evidence (round 9): iterate the FULL registry Verify ran,
    # not just the oracle map — a query whose plan fails analysis dumps
    # no parquet, and iterating outputs (or oracles, if one were ever
    # registered without SQL) would silently shrink the gate (the
    # round-7 incident: 25 queries vanished green). Every registry name
    # must produce exactly one line here; errors.json turns an absence
    # into an explicit ERR row, and the final assert makes any
    # registry/artifact mismatch a nonzero exit.
    # registry.json is the tamper-evidence commit marker (Verify writes
    # errors.json FIRST): fall back to oracle-only iteration ONLY when
    # the registry itself is absent (a genuinely pre-round-9 dump);
    # registry present but errors.json missing is a TORN artifact and
    # must fail loudly, not quietly downgrade the gate.
    import os
    # a subset dev dump (Verify with name args) rewrote registry.json
    # to the subset; iterating it WITHOUT an explicit name filter
    # would print "GATE OK: 1/1" over a 128-query engine — refuse.
    if os.path.exists(f"{out}/_SUBSET") and not names:
        print("GATE FAIL: subset artifact (see _SUBSET) — re-run full "
              "Verify or pass the query names explicitly")
        sys.exit(2)
    if os.path.exists(f"{out}/registry.json"):
        registry = json.load(open(f"{out}/registry.json"))
        if not os.path.exists(f"{out}/errors.json"):
            print("GATE FAIL: registry.json present but errors.json missing — torn artifact")
            sys.exit(2)
        errors = json.load(open(f"{out}/errors.json"))
    else:  # pre-round-9 dump
        registry, errors = sorted(oracles), {}
    # a requested name absent from the registry would be silently
    # skipped by the loop below — with a subset registry that can
    # make the gate check ZERO queries and still exit 0 ("GATE OK:
    # 0/0"); fail loudly instead
    unknown = sorted(set(names) - set(registry))
    if unknown:
        print(f"GATE FAIL: requested names not in this artifact's registry: {unknown}")
        sys.exit(2)
    import glob
    n_lines = n_fail = 0
    for name in sorted(registry):
        if names and name not in names:
            continue
        n_lines += 1
        if name in errors:
            print(f"{name}: ERR {errors[name]}"); n_fail += 1; continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: FAIL no spark output"); n_fail += 1; continue
        if name not in oracles:
            print(f"{name}: OK rows-only (no oracle SQL)"); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: FAIL oracle error: {e}"); n_fail += 1; continue
        verdict = compare(name, spark_df, duck_df)
        if not verdict.startswith("OK"):
            n_fail += 1
        print(f"{name}: {verdict}")
    # an oracle for a query the registry doesn't know means the dump
    # and oracle_sql.json came from different binaries — a mixed/torn
    # artifact (the reverse direction, registry-without-oracle, is the
    # legitimate rows-only case handled per-name above)
    stray = sorted(set(oracles) - set(registry))
    if stray:
        print(f"GATE FAIL: oracles for unregistered queries {stray[:5]} — mixed artifact")
        sys.exit(2)
    expected = len(registry) if not names else len(set(registry) & set(names))
    if n_fail:
        print(f"GATE FAIL: {n_fail}/{n_lines} queries failed")
        sys.exit(1)
    print(f"GATE OK: {n_lines}/{expected} queries green")


if __name__ == "__main__":
    main()
