"""Local mimic of the driver's correctness gate — crash-proof edition.

Runs every __ray_entry__.queries() entry at the given sf, compares with the
oracle_sql() DuckDB result: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns).

The full 203-query sweep is CHUNKED ACROSS CHILD PROCESSES (default 40
queries per fresh interpreter + fresh Ray session): Ray 2.49 carries a
known core race (`task_manager.cc:930 Check failed`) that can kill a
long-lived driver process mid-sweep — in a monolithic run that crash
masks every result after it. Here a dead child loses at most its chunk's
unreported tail, and the parent re-runs exactly those queries in a fresh
child (up to 2 retries, halving granularity), so ONE invocation always
reports a verdict for every query.

Usage:
    python tools/check_queries.py [sf_dir]                    # full sweep
    python tools/check_queries.py [sf_dir] q1 q2 ...          # in-process
    python tools/check_queries.py --chunk-size 25 [sf_dir]
    python tools/check_queries.py --gauntlet [out.json]       # ONE artifact:
        # rebuilds both adversarial corpora, then sweeps clean sf0.01 +
        # /tmp/nasty_sf (full query list each) + the 16-query adversarial
        # pages gate; writes every per-query verdict to out.json
        # (default /tmp/gauntlet.json)
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas() if hasattr(obj, "to_pandas") else pd.DataFrame(obj.take_all())


def value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize a nullable-int column (pandas Int64) to what DuckDB's
        # fetchdf yields for the same values: float64 when nulls are
        # present (NaN), plain int64 when none are — so "5" vs
        # "5.000000" never depends on which wrapper produced the frame
        if (isinstance(df[c].dtype, pd.api.extensions.ExtensionDtype)
                and pd.api.types.is_integer_dtype(df[c])):
            df[c] = df[c].astype(
                "float64" if df[c].isna().any() else "int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def run_in_process(sf_dir: str, names: list[str]) -> int:
    """Child / explicit-list mode: run the named queries in THIS process
    and print one `ok|rows|FAIL <name> ...` line per query (the parent
    parses these lines; a query with no line = the process died first)."""
    import duckdb

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"FAIL  {name:20s} unknown query", flush=True)
            failures += 1
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:20s} ray error: {type(e).__name__}: {e}",
                  flush=True)
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name:20s} {len(got):>8} rows   {dt:5.1f}s (rows-only)",
                  flush=True)
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:20s} oracle sql error: {e}", flush=True)
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems and value_hash(got) != value_hash(exp):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name:20s} {'; '.join(problems)}   {dt:5.1f}s",
                  flush=True)
            failures += 1
        else:
            print(f"ok    {name:20s} {len(got):>8} rows   {dt:5.1f}s",
                  flush=True)
    ray.shutdown()
    return 1 if failures else 0


def _parse_results(output: str) -> dict[str, str]:
    """name -> status for every result line a child managed to print."""
    got: dict[str, str] = {}
    for line in output.splitlines():
        parts = line.split()
        if len(parts) >= 2 and parts[0] in ("ok", "rows", "FAIL"):
            got[parts[1]] = parts[0]
    return got


def _run_child(sf_dir: str, names: list[str]) -> tuple[dict[str, str], bool]:
    """Run one chunk in a fresh interpreter; returns (results, crashed)
    where crashed means the process died without finishing its list."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--in-process",
         sf_dir, *names],
        capture_output=True, text=True, cwd=REPO,
    )
    sys.stdout.write(proc.stdout)
    sys.stdout.flush()
    results = _parse_results(proc.stdout)
    crashed = len(results) < len(names)
    if crashed:
        tail = proc.stderr.strip().splitlines()[-3:]
        print(f"CRASH child lost {len(names) - len(results)} queries "
              f"(exit {proc.returncode}): {' | '.join(tail)}", flush=True)
    return results, crashed


def sweep(sf_dir: str, names: list[str], chunk_size: int) -> dict[str, str]:
    """Chunked crash-proof sweep; returns {query: ok|rows|FAIL|CRASH}."""
    results: dict[str, str] = {}
    pending = list(names)
    attempt = 0
    size = max(1, chunk_size)
    while pending and attempt < 3:
        next_round: list[str] = []
        for i in range(0, len(pending), size):
            chunk = pending[i:i + size]
            got, _ = _run_child(sf_dir, chunk)
            results.update(got)
            next_round.extend(n for n in chunk if n not in got)
        pending = next_round
        attempt += 1
        size = max(1, size // 2)  # halve granularity on retry
    for name in pending:  # still unreported after retries
        results[name] = "CRASH"
    return results


def _summarize(results: dict[str, str]) -> tuple[int, int, int]:
    n_ok = sum(1 for s in results.values() if s == "ok")
    n_rows = sum(1 for s in results.values() if s == "rows")
    n_fail = sum(1 for s in results.values() if s in ("FAIL", "CRASH"))
    return n_ok, n_rows, n_fail


def run_chunked(sf_dir: str, names: list[str], chunk_size: int) -> int:
    results = sweep(sf_dir, names, chunk_size)
    n_ok, n_rows, n_fail = _summarize(results)
    print(f"\n==== {len(names)} queries: {n_ok} hash-green, "
          f"{n_rows} rows-only, {n_fail} failures ====")
    if n_fail:
        for name, s in results.items():
            if s in ("FAIL", "CRASH"):
                print(f"  {s}: {name}")
    return 1 if n_fail else 0


#: the adversarial-pages gate (SKILL.md surface 6): every query that reads
#: the flagship pages corpus, run under FBR_PAGES_OVERRIDE
PAGES_GATE_QUERIES = [
    "weblog_aggregate", "weblog_from_html", "weblog_from_warc",
    "url_parts", "warc_roundtrip", "weblog_error_rate",
    "weblog_method_bytes", "weblog_size_quantiles", "weblog_visitors",
    "top_paths", "lineage_metrics", "burn_rate", "geo_traffic",
    "host_skew", "dq_audit", "dup_histogram",
]


def run_gauntlet(out_path: str, chunk_size: int) -> int:
    """ONE command, ONE artifact: the full sweep on the clean sf0.01
    corpus, the full sweep on the adversarial /tmp/nasty_sf corpus, and
    the 16-query adversarial-pages gate — both adversarial corpora are
    (re)built first, so the artifact always reflects HEAD against fresh
    corpora (VERDICT r4 #9)."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "nasty_corpus", os.path.join(REPO, "tools", "nasty_corpus.py"))
    nasty = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(nasty)
    nasty_sf = nasty.build("/root/testdata/sf0.001", "/tmp/nasty_sf")
    nasty_pages = nasty.build_pages()

    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    artifact: dict = {"queries_total": len(names)}

    # phases 1-2 are "clean"/"nasty_sf" only with the default pages corpus:
    # drop any inherited override for the whole gauntlet, then restore the
    # caller's value afterwards (unconditionally deleting it clobbered a
    # user-exported override)
    prev_override = os.environ.pop("FBR_PAGES_OVERRIDE", None)
    if prev_override is not None:
        print(f"(note: ignoring inherited FBR_PAGES_OVERRIDE="
              f"{prev_override} for phases 1-2; restored afterwards)")
    try:
        print(f"=== gauntlet 1/3: clean sf0.01 ({len(names)} queries)")
        artifact["clean_sf001"] = sweep("/root/testdata/sf0.01", names,
                                        chunk_size)
        print(f"=== gauntlet 2/3: adversarial {nasty_sf} ({len(names)})")
        artifact["nasty_sf"] = sweep(nasty_sf, names, chunk_size)
        print(f"=== gauntlet 3/3: adversarial pages gate "
              f"({len(PAGES_GATE_QUERIES)} queries)")
        os.environ["FBR_PAGES_OVERRIDE"] = nasty_pages  # children inherit
        artifact["nasty_pages"] = sweep("/root/testdata/sf0.001",
                                        PAGES_GATE_QUERIES, chunk_size)
    finally:
        if prev_override is None:
            os.environ.pop("FBR_PAGES_OVERRIDE", None)
        else:
            os.environ["FBR_PAGES_OVERRIDE"] = prev_override

    total_fail = 0
    for corpus in ("clean_sf001", "nasty_sf", "nasty_pages"):
        n_ok, n_rows, n_fail = _summarize(artifact[corpus])
        artifact[f"{corpus}_summary"] = {
            "ok": n_ok, "rows_only": n_rows, "failures": n_fail}
        total_fail += n_fail
        print(f"==== {corpus}: {n_ok} hash-green, {n_rows} rows-only, "
              f"{n_fail} failures ====")
    artifact["all_green"] = total_fail == 0
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"gauntlet artifact -> {out_path}")
    return 1 if total_fail else 0


def main() -> int:
    args = sys.argv[1:]
    in_process = "--in-process" in args
    if in_process:
        args.remove("--in-process")
    chunk_size = 40
    if "--chunk-size" in args:
        i = args.index("--chunk-size")
        chunk_size = int(args[i + 1])
        del args[i:i + 2]
    if "--gauntlet" in args:
        i = args.index("--gauntlet")
        out_path = (args[i + 1] if i + 1 < len(args)
                    else "/tmp/gauntlet.json")
        return run_gauntlet(out_path, chunk_size)
    unknown = [a for a in args if a.startswith("-")]
    if unknown:  # e.g. --help: fail fast, don't sweep a nonsense sf_dir
        print(__doc__)
        print(f"unknown flag(s): {' '.join(unknown)}")
        return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]
    if not os.path.isdir(sf_dir):
        print(f"sf_dir is not a directory: {sf_dir}")
        return 2

    if in_process or names:
        if not names:  # child invoked with no explicit list: everything
            sys.path.insert(0, REPO)
            import __ray_entry__ as entrymod

            names = list(entrymod.queries())
        return run_in_process(sf_dir, names)

    # parent mode: enumerate, then chunk across fresh interpreters
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    return run_chunked(sf_dir, names, chunk_size)


if __name__ == "__main__":
    raise SystemExit(main())
