#!/usr/bin/env python3
"""Ingest a tools/tpu_queue.sh output directory into the repo's records.

The queue leaves per-stage logs in ``<outdir>/<stage>.log`` plus a
``queue_status`` file.  This tool turns a finished (or partial) queue run
into the round's bookkeeping, replacing the manual post-recovery checklist
(memory: round-4 session notes):

  * collects every JSON object line from every stage log;
  * appends tagged rows (``round``, ``stage``) to
    benchmarks/RESULTS_tpu_v5e.jsonl — idempotent: rows already present
    (ignoring the tags) are skipped;
  * prints PARITY.md's ready-to-paste canonical markdown table from the
    parity_table rows;
  * prints decision summaries: headline vs 2 ms budget, whether
    ``fused_dz`` beat the headline (flip the default if so), slab_cost
    ratios vs the <=1.5x acceptance, pcg_slab ratio vs the <=2x
    acceptance, and the best cap/tol operating points from the tune logs.

Dry-run by default; ``--apply`` writes the RESULTS rows.

Usage: python tools/ingest_tpu_queue.py [outdir] [--round 4] [--apply]
"""

import argparse
import json
import pathlib
import sys


def parse_log(path):
    """Return the list of JSON-object lines in a stage log."""
    rows = []
    if not path.exists():
        return rows
    for line in path.read_text().splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            rows.append(obj)
    return rows


def markdown_table(parity_rows):
    lines = ["| N | exit | SQP iter (us) | vs 2 ms budget | mean PCG iters "
             "| max-iter exits | mean L1 track err | cap | linsys |",
             "|---|---|---|---|---|---|---|---|---|"]
    for r in parity_rows:
        cap_pct = r.get("max_iter_exit_pct")
        lines.append(
            f"| {r['knots']} | {r['exit']} | {r['us_per_sqp_iteration']} | "
            f"{r['vs_2ms_budget']}x | {r['mean_pcg_iters']} | "
            f"{'-' if cap_pct is None else f'{cap_pct}%'} | "
            f"{r['mean_tracking_err']} | {r['pcg_cap']} | {r['linsys']} |")
    return "\n".join(lines)


def best_operating_points(tune_rows, err_slack=1.05):
    """Per (knots, criterion): fastest point whose avg tracking error is
    within ``err_slack`` of the best error seen for that horizon."""
    by_n = {}
    for r in tune_rows:
        by_n.setdefault((r["knots"], r["exit_criterion"]), []).append(r)
    best = {}
    for key, rows in sorted(by_n.items()):
        floor = min(r["avg_tracking_error"] for r in rows)
        ok = [r for r in rows
              if r["avg_tracking_error"] <= max(floor * err_slack,
                                                floor + 1e-5)]
        best[key] = min(ok, key=lambda r: r["us_per_control_step"])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?",
                    default="benchmarks/tpu_queue_r4")
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--results", default="benchmarks/RESULTS_tpu_v5e.jsonl")
    ap.add_argument("--apply", action="store_true",
                    help="append new rows to the RESULTS jsonl")
    args = ap.parse_args()

    out = pathlib.Path(args.outdir)
    status = out / "queue_status"
    if status.exists():
        print("=== queue_status ===")
        print(status.read_text().rstrip())
    else:
        print(f"no queue_status in {out} — queue has not run", file=sys.stderr)

    stage_rows = {}
    for log in sorted(out.glob("*.log")):
        rows = parse_log(log)
        if rows:
            stage_rows[log.stem] = rows

    # --- decision summaries -------------------------------------------------
    parity = stage_rows.get("parity_table", [])
    if parity:
        print("\n=== PARITY.md canonical table (paste) ===")
        print(markdown_table(parity))

    for b in stage_rows.get("bench", []):
        if b.get("metric"):
            print("\n=== headline ===")
            print(f"{b['metric']} = {b.get('value')} us "
                  f"(vs_baseline {b.get('vs_baseline')}x, "
                  f"mean_pcg_iters {b.get('mean_pcg_iters')})")
            fdz, v = b.get("fused_dz_us"), b.get("value")
            if fdz is not None and v is not None:
                verdict = ("FLIP fused_dz default ON" if fdz < v
                           else "keep fused_dz default off")
                print(f"fused_dz_us = {fdz} vs {v} -> {verdict}")
            if b.get("pcr_us") is not None:
                print(f"pcr_us = {b['pcr_us']}")

    for name, limit in (("slab_cost_64", 1.5), ("slab_cost_128", 1.5),
                        ("pcg_slab_cost", 2.0)):
        for r in stage_rows.get(name, []):
            if "ratio" in r:
                ok = "PASS" if r["ratio"] <= limit else "FAIL"
                print(f"\n{name}: ratio {r['ratio']} vs <={limit} "
                      f"acceptance -> {ok}  {json.dumps(r)}")

    tune = (stage_rows.get("tune_rnorm", []) + stage_rows.get("tune_eta", []))
    if tune:
        print("\n=== tuned operating points (fastest within 5% of best "
              "tracking error) ===")
        for (n, crit), r in best_operating_points(tune).items():
            print(f"N={n} {crit}: cap={r['pcg_cap']} tol={r['exit_tol']} "
                  f"-> {r['us_per_control_step']} us/step "
                  f"(avg_err {r['avg_tracking_error']})")

    # --- RESULTS jsonl append ----------------------------------------------
    results = pathlib.Path(args.results)
    seen = set()
    if results.exists():
        for line in results.read_text().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict):
                d.pop("round", None)
                d.pop("stage", None)
                seen.add(json.dumps(d, sort_keys=True))

    new = []
    for stage, rows in sorted(stage_rows.items()):
        for r in rows:
            key = json.dumps(
                {k: v for k, v in r.items() if k not in ("round", "stage")},
                sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            new.append(dict(r, round=args.round, stage=stage))

    print(f"\n{len(new)} new RESULTS rows "
          f"({'appending' if args.apply else 'dry-run; use --apply'})")
    for r in new:
        print(json.dumps(r))
    if args.apply and new:
        with results.open("a") as f:
            for r in new:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
