#!/usr/bin/env python3
"""Rebase committed per-SF bench baselines from a full-pass run.

Usage: rebase_baselines.py <committed.json> <full_pass.json> [name=value ...]

Rules (the builder's re-base convention, NOTES_r16/r17):
- existing queries: min-merge (a committed best only ever moves DOWN
  from a new full-pass observation);
- missing queries: adopt the full-pass value (first honest baseline);
- explicit name=value overrides: set exactly that value — used ONLY for
  evidence-backed upward re-bases of bests that proved unattainable in
  full-pass context (adjudicated via `graft.Bench --full-context`).
Writes the merged map back to <committed.json> (sorted, 3 decimals).
"""
import json
import sys


def main() -> None:
    committed_path, full_path = sys.argv[1], sys.argv[2]
    overrides = dict(kv.split("=", 1) for kv in sys.argv[3:])
    committed = json.load(open(committed_path))
    full = json.load(open(full_path))
    # cross-SF guard: merging a SMALLER scale factor's pass into a
    # bigger SF's baseline min-merges scale-dependent entries far
    # downward (this almost corrupted the sf0.1 baseline with sf0.001
    # times in r17). Bench stamps its SF into bench_full.json as an
    # `_sf_<tag>` sentinel; when present it must match the committed
    # file's name. Sentinels (and `_cal`) never merge as queries.
    sf_tags = [k[4:] for k in full if k.startswith("_sf_")]
    # exact-tag equality against the committed filename (baseline_<tag>
    # .json), not substring containment — a tag that is a prefix of
    # another (sf0_1 vs sf0_12) must not slip through the guard
    committed_name = committed_path.rsplit("/", 1)[-1]
    committed_tag = committed_name.removeprefix("baseline_")
    committed_tag = committed_tag.removesuffix(".json")
    if sf_tags and committed_tag not in sf_tags:
        sys.exit(f"refusing: full-pass file is from SF {sf_tags} but the "
                 f"committed baseline is {committed_tag} — wrong-SF merge")
    full = {k: v for k, v in full.items() if not k.startswith("_sf_")}
    out = dict(committed)
    for name, t in full.items():
        if name in out:
            out[name] = min(out[name], t)
        else:
            out[name] = t
            print(f"new      {name}: {t:.3f}")
    for name, v in overrides.items():
        old = out.get(name)
        out[name] = float(v)
        print(f"override {name}: {old} -> {v}")
    for name in sorted(out):
        if name in committed and out[name] < committed[name] - 1e-9:
            print(f"lowered  {name}: {committed[name]:.3f} -> {out[name]:.3f}")
    with open(committed_path, "w") as f:
        f.write("{" + ",".join(
            f'"{k}":{out[k]:.3f}' for k in sorted(out)) + "}")
    print(f"wrote {committed_path} ({len(out)} entries)")


if __name__ == "__main__":
    main()
