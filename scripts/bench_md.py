"""Marker-delimited section updates for BENCH.md.

Every evidence script (scaling_bench, ann_recall, bucketed_bench)
owns one `<!-- key:begin -->…<!-- key:end -->` section and replaces
ONLY that; round 2 lost the ANN-recall and bucketed-join tables because
scaling_bench rewrote the whole file."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_MD = os.path.join(REPO, "BENCH.md")


def update_section(key: str, content: str, path: str = BENCH_MD) -> None:
    begin, end = f"<!-- {key}:begin -->", f"<!-- {key}:end -->"
    block = f"{begin}\n{content.rstrip()}\n{end}"
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    if begin in text and end in text:
        pre = text.split(begin)[0]
        post = text.split(end, 1)[1]
        text = pre + block + post
    else:
        text = (text.rstrip() + "\n\n" if text.strip() else "") + block + "\n"
    with open(path, "w") as f:
        f.write(text)
