"""Regenerate tools/gate_state.json from driver CORRECTNESS files.

Usage:
    python tools/gate_state.py CORRECTNESS_r01.json:1 CORRECTNESS_r02.json:2 ...

Each argument is ``<path>:<round_no>``; files are folded in order, so a
later round's green row supersedes an earlier one. The recorded hash is
the entry's CURRENT content hash — run this only when the checked-out
code is known-good for every recorded entry (i.e. right after a round's
correctness results, or after locally re-verifying changed entries with
tools/check_parity.py).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shuttlestandalonedbcreator_spark import gate  # noqa: E402
from shuttlestandalonedbcreator_spark.queries import CATALOG  # noqa: E402


def main(argv: list[str]) -> None:
    state = gate.load_state()
    for arg in argv:
        path, _, round_no = arg.rpartition(":")
        with open(path) as f:
            correctness = json.load(f)
        state = gate.record_round(CATALOG, correctness, int(round_no), state)
    gate.save_state(state)
    order = gate.gate_order(CATALOG, state)
    modified = [n for n in order if state.get(n) and
                state[n]["hash"] != gate.entry_hash(CATALOG[n])]
    unchecked = [n for n in order if n not in state]
    print(f"state: {len(state)} recorded / {len(CATALOG)} catalog entries")
    print(f"modified-since-green (walk first): {modified or 'none'}")
    print(f"never-checked (walk second): {unchecked or 'none'}")


if __name__ == "__main__":
    main(sys.argv[1:])
