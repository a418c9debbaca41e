"""Collect `tools/eval_per_source.py` aggregate lines into a markdown table.

Usage: python tools/summarize_evals.py logs/eval_r5_*_harsh.log logs/eval_r5_*_mild.log
Each log's last JSON line (`{"aggregate_over_sources": ...}`) becomes a row;
the row label is derived from the file name (`eval_r5_<tag>_<family>.log`).
"""

import json
import re
import sys
from pathlib import Path


def row_for(path: str):
    agg = None
    weights = "?"
    for line in Path(path).read_text().splitlines():
        if line.startswith("# weights:"):
            weights = line.split("# weights:")[1].strip()
        if '"aggregate_over_sources"' in line:
            agg = json.loads(line)["aggregate_over_sources"]
    if agg is None:
        return f"| {path} | (no aggregate line — run incomplete?) |"
    m = re.search(r"eval_\w+?_(\w+)_(harsh|mild)", Path(path).stem)
    tag = f"{m.group(1)}, {m.group(2)}" if m else Path(path).stem
    return (
        f"| {tag} (`{Path(weights).name}`) | {agg['repeatability']:.3f} | "
        f"{agg['localization_error']:.2f} | {agg['match_precision']:.3f} | "
        f"{agg['homography_acc_3px']:.3f} | "
        f"{agg['num_matches']:.1f} ({agg['num_correct_matches']:.1f}) |"
    )


def main() -> None:
    print("| Model / family | repeat. | loc.err | precision | acc@3px |"
          " matches (correct) |")
    print("|---|---|---|---|---|---|")
    for path in sys.argv[1:]:
        print(row_for(path))


if __name__ == "__main__":
    main()
