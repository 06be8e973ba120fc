"""Compute-demo examples — the reference's pure-CPU fan-out jobs.

Reference parity:
- BaileyBorweinPlouffe (EX/BaileyBorweinPlouffe.java:92,315-361): hex
  digits of pi at arbitrary positions via the BBP digit-extraction
  formula; each map task computes an independent digit range.
- Sudoku / DistributedPentomino (EX/dancing/Sudoku.java,
  EX/dancing/DistributedPentomino.java:91-120): exact-cover search where
  the map fan-out enumerates solution PREFIXES to a fixed depth and each
  task exhausts its subtree.

Spark-first shape: the work list (digit positions / search prefixes) is a
DataFrame; the kernel runs in Arrow-batched ``mapInPandas`` — Python is
the point here (the reference's kernel is Java math, ours is Python
math), and per-row cost dwarfs the batch transfer. Fan-out is a narrow
map over an evenly repartitioned range: zero shuffles, linear scaling —
at 1000 executors each task owns a contiguous digit range or a prefix
subtree, exactly the reference's split strategy.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def pi_hex_digit(d: int) -> str:
    """Hex digit of pi at 1-based fractional position ``d`` (BBP
    digit-extraction: fractional part of 16^(d-1)*pi via modular
    exponentiation; EX/BaileyBorweinPlouffe.java:315 `hexDigits`).

    Float error grows with position; exact up to ~1e6 digits, far beyond
    the demo range."""
    n = d - 1

    def S(j: int) -> float:
        s = 0.0
        for k in range(n + 1):
            s = (s + pow(16, n - k, 8 * k + j) / (8 * k + j)) % 1.0
        t, k = 0.0, n + 1
        while True:
            nt = t + 16.0 ** (n - k) / (8 * k + j)
            if nt == t:
                return s + t
            t, k = nt, k + 1

    x = (4.0 * S(1) - 2.0 * S(4) - S(5) - S(6)) % 1.0
    return "%X" % int(x * 16.0)


def bbp_pi_digits(spark: SparkSession, n_digits: int, n_splits: int = 32) -> DataFrame:
    """First ``n_digits`` hex digits of pi, one row per position.

    ``spark.range(..., numPartitions=n_splits)`` hands each task a
    contiguous digit range (BaileyBorweinPlouffe.java:92's
    BbpInputFormat splits); per-digit cost is O(d), so later ranges are
    heavier — n_splits > cores lets the scheduler level the skew, the
    same remedy the reference documents for its tail splits."""
    schema = T.StructType(
        [T.StructField("pos", T.LongType()), T.StructField("digit", T.StringType())]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pos = pdf["id"] + 1
            yield pd.DataFrame({"pos": pos, "digit": [pi_hex_digit(int(p)) for p in pos]})

    return spark.range(0, n_digits, numPartitions=n_splits).mapInPandas(kernel, schema)


# ---------------------------------------------------------------- sudoku

def _sudoku_candidates(board: list[int], cell: int) -> list[int]:
    r, c = divmod(cell, 9)
    br, bc = 3 * (r // 3), 3 * (c // 3)
    used = set(board[r * 9 : r * 9 + 9])
    used |= {board[c + 9 * i] for i in range(9)}
    used |= {board[(br + i) * 9 + bc + j] for i in range(3) for j in range(3)}
    return [v for v in range(1, 10) if v not in used]


def _sudoku_solve(board: list[int]) -> list[list[int]]:
    """Exhaustive backtracking over empty cells (the subtree a single
    task owns); returns every solution in its subtree."""
    try:
        cell = board.index(0)
    except ValueError:
        return [board[:]]
    out = []
    for v in _sudoku_candidates(board, cell):
        board[cell] = v
        out.extend(_sudoku_solve(board))
        board[cell] = 0
    return out


def sudoku_branches(puzzle: str, depth: int = 2) -> list[str]:
    """Enumerate consistent assignments of the first ``depth`` empty
    cells — the map fan-out (DistributedPentomino.java:91 `getSplits`
    generates prefix boards exactly like this, then one map per prefix)."""
    start = [int(ch) for ch in puzzle]
    frontier = [start]
    for _ in range(depth):
        nxt = []
        for b in frontier:
            try:
                cell = b.index(0)
            except ValueError:
                nxt.append(b)
                continue
            for v in _sudoku_candidates(b, cell):
                nb = b[:]
                nb[cell] = v
                nxt.append(nb)
        frontier = nxt
    return ["".join(map(str, b)) for b in frontier]


def sudoku_solve_distributed(
    spark: SparkSession, puzzle: str, depth: int = 2
) -> DataFrame:
    """Distributed Sudoku (EX/dancing/Sudoku.java solved with
    DistributedPentomino.java's prefix fan-out): driver enumerates the
    tiny prefix frontier, one task exhausts each subtree, solutions union
    back. ``distinct`` folds subtrees that converge on the same solution
    (cannot happen for disjoint prefixes, but keeps the contract honest)."""
    branches = sudoku_branches(puzzle, depth)
    schema = T.StructType([T.StructField("solution", T.StringType())])

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            sols = []
            for b in pdf["branch"]:
                sols.extend(
                    "".join(map(str, s)) for s in _sudoku_solve([int(ch) for ch in b])
                )
            yield pd.DataFrame({"solution": sols})

    branch_df = spark.createDataFrame(
        [(b,) for b in branches], ["branch"]
    ).repartition(min(len(branches), 32))
    return branch_df.mapInPandas(kernel, schema).distinct()
