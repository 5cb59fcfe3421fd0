"""Collective-traffic accounting from optimized HLO.

The single chip here can't measure multi-chip throughput, so the honest
stand-in (and the regression tripwire against a change silently doubling
ICI traffic) is the per-step collective byte count straight from the
compiled program: after jit+shard_map the SPMD partitioner has placed
every all-reduce / all-gather / reduce-scatter / collective-permute /
all-to-all, and their operand shapes are static. ``collective_stats``
parses ``compiled.as_text()`` and sums the result-tensor bytes per
collective kind; docs/BENCH.md's "Collective traffic" table and
tests/test_collective_bytes.py are built on it.

Byte semantics: the RESULT shape of each collective op (for a ring
all-reduce of a P-byte tensor over N chips the wire cost per chip is
2(N-1)/N * P — callers apply algorithm factors; this module reports the
logical tensor bytes, which is the invariant the tests pin).
"""

from __future__ import annotations

import re
from typing import Dict

# dtype -> bytes (HLO spellings)
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# the collective op kinds the SPMD partitioner emits (async variants
# appear as <kind>-start; the -done carries no new payload)
KINDS = ("all-reduce", "all-gather", "reduce-scatter",
         "collective-permute", "all-to-all")

_ARRAY_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]")
_LINE_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+("
    + "|".join(k for k in KINDS)
    + r")(-start)?\(")


def _shape_bytes(shape_text: str) -> int:
    """Sum the bytes of every array literal in an HLO result type
    (handles tuples: variadic all-reduce results are '(f32[..], ..)')."""
    total = 0
    for dtype, dims in _ARRAY_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Optimized-HLO text -> {kind: {"count": n, "bytes": b}}.

    ``bytes`` is the summed result-tensor size of every op of that kind
    (async -start ops counted once, -done skipped)."""
    stats = {k: {"count": 0, "bytes": 0} for k in KINDS}
    for line in hlo_text.splitlines():
        m = _LINE_RE.search(line)
        if not m:
            continue
        shape_text, kind, is_start = m.group(1), m.group(2), m.group(3)
        if is_start:
            # Async pair: the -start result is a tuple that ALIASES the
            # operand (plus the true result and small u32 scratch).
            # Counting the whole tuple double-counts; counting the
            # operand alone would make all-gather/reduce-scatter bytes
            # differ by a factor of N from the sync spelling. Normalize
            # to the RESULT: tuple bytes minus operand bytes.
            # scan to the MATCHING close paren of the operand list:
            # rfind(')') would land inside trailing attributes whenever
            # metadata contains parens (op_name="pjit(train_step)/..."),
            # letting shape-like tokens there count as phantom operands
            seg = line[m.end():]
            depth, end = 1, len(seg)
            for i, ch in enumerate(seg):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            operand_bytes = _shape_bytes(seg[:end])
            if shape_text.startswith("("):
                nbytes = _shape_bytes(shape_text) - operand_bytes
                if nbytes <= 0:  # unexpected spelling: fall back
                    nbytes = operand_bytes
            else:
                nbytes = _shape_bytes(shape_text)
        else:
            nbytes = _shape_bytes(shape_text)
        stats[kind]["count"] += 1
        stats[kind]["bytes"] += nbytes
    return {k: v for k, v in stats.items() if v["count"]}


def total_bytes(stats: Dict[str, Dict[str, int]]) -> int:
    return sum(v["bytes"] for v in stats.values())
