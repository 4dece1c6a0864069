#!/usr/bin/env python3
"""Cross-layout determinism sweep (dev tool): compare two Verify dumps
produced under DIFFERENT partition layouts (e.g. SPARK_GRAFT_CPUS=5 vs
32). Any query whose canonicalized output differs between layouts has a
q262-class defect: a value that depends on task-completion order (an
unordered double merge, an undeterministic tiebreak, ...) and will
eventually flip the driver's hash gate even if today's run matched.

Usage: python3 tools/layout_diff.py <dirA> <dirB>
Exit 1 if any query differs.
"""
import sys, os, glob
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    keys = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    return df.sort_values(by=keys or list(df.columns), ignore_index=True)


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{a_dir}/q*") if os.path.isdir(p))
    bad = []
    for name in names:
        bp = f"{b_dir}/{name}"
        if not os.path.isdir(bp):
            print(f"{name:34s} MISSING in {b_dir}")
            bad.append(name)
            continue
        a = canon(pd.concat(map(pd.read_parquet, glob.glob(f"{a_dir}/{name}/*.parquet"))))
        b = canon(pd.concat(map(pd.read_parquet, glob.glob(f"{bp}/*.parquet"))))
        if list(a.columns) != list(b.columns) or len(a) != len(b):
            print(f"{name:34s} SHAPE-DIFF a={a.shape} b={b.shape}")
            bad.append(name)
            continue
        diffs = []
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if pd.api.types.is_float_dtype(a[c]):
                # bit-exact: layout must not move even the last ulp of a
                # HASHED column (the driver hashes typed values)
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            else:
                eq = pd.Series(av).astype(str).to_numpy() == \
                    pd.Series(bv).astype(str).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                diffs.append(f"{c}[row {i}: {av[i]!r} vs {bv[i]!r}]")
        if diffs:
            print(f"{name:34s} VALUE-DIFF " + "; ".join(diffs[:3]))
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} layout-stable")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
