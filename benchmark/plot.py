"""Benchmark report/plot — counterpart of the reference's ``benchmark/plot.py``.

The reference renders its published FPS tables (``benchmark/README.md:198-260``)
from result files; this renders the per-round driver captures
(``BENCH_r*.json`` at the repo root) as

* a markdown table on stdout (always — works headless), and
* with ``--out report.png``, a grouped horizontal bar chart of per-family
  env-steps/s across the last rounds (log x: families span 31k..73M).

Usage::

    python -m benchmark.plot                 # table to stdout
    python -m benchmark.plot --out bench.png # + chart
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, List, Tuple

# categorical series colors (fixed slot order, light-surface steps)
_SERIES = ["#2a78d6", "#eb6834", "#1baf7a"]
_INK = "#1a1a19"
_INK_2 = "#5f5e56"


def load_rounds(root: str) -> List[Tuple[str, Dict[str, float]]]:
  """[(round_name, {family: value})] for every BENCH_r*.json, in order."""
  out = []
  for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
    with open(path) as f:
      rec = json.load(f)
    rec = rec.get("parsed") or rec  # early rounds have "parsed": null
    detail = {
      k: float(v) for k, v in rec.get("detail", {}).items()
      if isinstance(v, (int, float)) and k != "host_cores"
    }
    if detail:
      name = os.path.basename(path).replace("BENCH_", "").replace(
        ".json", ""
      )
      out.append((name, detail))
  return out


def _fmt(v: float) -> str:
  if v >= 1e6:
    return f"{v / 1e6:.1f}M"
  if v >= 1e3:
    return f"{v / 1e3:.1f}k"
  return f"{v:.2f}"


def print_table(rounds: List[Tuple[str, Dict[str, float]]]) -> None:
  keys: List[str] = []
  for _, d in rounds:
    for k in d:
      if k not in keys:
        keys.append(k)
  names = [n for n, _ in rounds]
  print("| family | " + " | ".join(names) + " |")
  print("|---" * (len(names) + 1) + "|")
  for k in keys:
    cells = []
    for _, d in rounds:
      cells.append(_fmt(d[k]) if k in d else "—")
    print(f"| {k} | " + " | ".join(cells) + " |")


def plot(
  rounds: List[Tuple[str, Dict[str, float]]], out: str, last: int = 3
) -> None:
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  rounds = rounds[-last:]
  # chart covers throughput cells only (one axis: steps/s); latency
  # cells (ms) stay in the table — two units never share an axis
  fams: List[str] = []
  for _, d in rounds:
    for k, v in d.items():
      if "ms" not in k and v > 0 and k not in fams:
        fams.append(k)
  latest = rounds[-1][1]
  fams.sort(key=lambda k: latest.get(k, 0.0))

  fig, ax = plt.subplots(
    figsize=(9, 0.5 * len(fams) + 1.6), facecolor="white"
  )
  h = 0.8 / len(rounds)
  for i, (name, d) in enumerate(rounds):
    ys = [j + (i - (len(rounds) - 1) / 2) * h for j in range(len(fams))]
    vs = [d.get(k, 0.0) for k in fams]
    ax.barh(
      ys, vs, height=h * 0.9, color=_SERIES[i % len(_SERIES)],
      label=name, zorder=3,
    )
    if i == len(rounds) - 1:  # direct labels on the latest round only
      for y, v in zip(ys, vs):
        if v > 0:
          ax.text(
            v * 1.15, y, _fmt(v), va="center", fontsize=8, color=_INK,
          )
  ax.set_yticks(range(len(fams)))
  ax.set_yticklabels(fams, fontsize=9, color=_INK)
  ax.set_xscale("log")
  ax.set_xlabel("env-steps/s per chip (log)", fontsize=9, color=_INK_2)
  ax.tick_params(colors=_INK_2, labelsize=8)
  ax.grid(axis="x", color="#e6e4dd", linewidth=0.7, zorder=0)
  for s in ("top", "right", "left"):
    ax.spines[s].set_visible(False)
  ax.spines["bottom"].set_color("#c3c2b7")
  ax.legend(frameon=False, fontsize=9, loc="lower right")
  ax.set_title(
    "envpool_tpu per-family throughput by round", fontsize=11,
    color=_INK, loc="left",
  )
  fig.tight_layout()
  fig.savefig(out, dpi=150)
  print(f"wrote {out}")


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument(
    "--root", default=os.path.dirname(os.path.dirname(os.path.abspath(
      __file__
    )))
  )
  p.add_argument("--out", default=None, help="write a PNG chart here")
  p.add_argument("--last", type=int, default=3,
                 help="rounds to chart (table shows all)")
  args = p.parse_args()
  rounds = load_rounds(args.root)
  if not rounds:
    raise SystemExit("no BENCH_r*.json found")
  print_table(rounds)
  if args.out:
    plot(rounds, args.out, args.last)


if __name__ == "__main__":
  main()
