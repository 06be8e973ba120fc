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
    if not branches:
        # contradictory givens prune every depth-d prefix: the correct
        # answer is an empty solution set, not a createDataFrame error
        return spark.createDataFrame([], schema)

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


# ------------------------------------------------------------- pentomino

# The 12 free pentominoes (Conway naming), one canonical orientation
# each; _orientations() closes over rotation/reflection.
PENTOMINOES: dict[str, list[tuple[int, int]]] = {
    "F": [(0, 1), (0, 2), (1, 0), (1, 1), (2, 1)],
    "I": [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)],
    "L": [(0, 0), (1, 0), (2, 0), (3, 0), (3, 1)],
    "N": [(0, 1), (1, 1), (2, 0), (2, 1), (3, 0)],
    "P": [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0)],
    "T": [(0, 0), (0, 1), (0, 2), (1, 1), (2, 1)],
    "U": [(0, 0), (0, 2), (1, 0), (1, 1), (1, 2)],
    "V": [(0, 0), (1, 0), (2, 0), (2, 1), (2, 2)],
    "W": [(0, 0), (1, 0), (1, 1), (2, 1), (2, 2)],
    "X": [(0, 1), (1, 0), (1, 1), (1, 2), (2, 1)],
    "Y": [(0, 1), (1, 0), (1, 1), (2, 1), (3, 1)],
    "Z": [(0, 0), (0, 1), (1, 1), (2, 1), (2, 2)],
}


def _orientations(cells: list[tuple[int, int]]) -> list[tuple[tuple[int, int], ...]]:
    """All distinct rotations+reflections, each normalized to touch
    (0,0) and sorted — the placement generator's stamp set."""
    out = set()
    shape = cells
    for _ in range(2):  # identity, reflection
        for _ in range(4):  # four rotations
            shape = [(c, -r) for r, c in shape]  # rotate 90°
            mr = min(r for r, _ in shape)
            mc = min(c for _, c in shape)
            out.add(tuple(sorted((r - mr, c - mc) for r, c in shape)))
        shape = [(r, -c) for r, c in shape]  # reflect
    return sorted(out)


def pentomino_matrix(width: int, height: int):
    """Exact-cover matrix for tiling a height×width board with the 12
    pentominoes (EX/dancing/Pentomino.java:238 `initialize` builds the
    same matrix for its DancingLinks solver): columns = 12 piece names +
    width*height cells; one row per legal placement, deterministic id
    order. Returns (X: col->set(row_id), Y: row_id->list(col))."""
    Y: dict[int, list] = {}
    rid = 0
    for name in sorted(PENTOMINOES):
        for shape in _orientations(PENTOMINOES[name]):
            for r0 in range(height):
                for c0 in range(width):
                    cells = [(r0 + r, c0 + c) for r, c in shape]
                    if all(0 <= r < height and 0 <= c < width for r, c in cells):
                        Y[rid] = [name] + [r * width + c for r, c in cells]
                        rid += 1
    X: dict = {}
    for row_id, cols in Y.items():
        for col in cols:
            X.setdefault(col, set()).add(row_id)
    return X, Y


def _select(X, Y, row):
    """Knuth Algorithm X cover step (choose ``row``) on the dict-of-sets
    representation — removes every column the row satisfies and every
    row that conflicts with it; returns the removals for _deselect."""
    cols = []
    for j in Y[row]:
        for i in X[j]:
            for k in Y[i]:
                if k != j:
                    X[k].remove(i)
        cols.append(X.pop(j))
    return cols


def _deselect(X, Y, row, cols):
    for j in reversed(Y[row]):
        X[j] = cols.pop()
        for i in X[j]:
            for k in Y[i]:
                if k != j:
                    X[k].add(i)


def _algox_count(X, Y) -> int:
    """Count exact covers (the subtree a single task owns; the analog of
    the reference's DancingLinks.solve counting via its SolutionAcceptor,
    EX/dancing/DancingLinks.java:368)."""
    if not X:
        return 1
    col = min(X, key=lambda c: (len(X[c]), str(c)))
    total = 0
    for row in sorted(X[col]):
        cols = _select(X, Y, row)
        total += _algox_count(X, Y)
        _deselect(X, Y, row, cols)
    return total


def pentomino_branches(width: int, height: int, depth: int) -> list[list[int]]:
    """Deterministic prefix fan-out: walk Algorithm X to ``depth``
    choices and emit each consistent prefix (list of row ids) — exactly
    DistributedPentomino.java:91 `getSplits` / Pentomino.getSplits,
    which enumerates width-`depth` prefixes of the search tree so each
    map task exhausts one disjoint subtree."""
    X, Y = pentomino_matrix(width, height)
    out: list[list[int]] = []

    def walk(d: int, prefix: list[int]) -> None:
        if not X:
            # solved above the fan-out depth: a leaf prefix whose
            # subtree is exactly one solution
            out.append(prefix[:])
            return
        if d == depth:
            out.append(prefix[:])
            return
        col = min(X, key=lambda c: (len(X[c]), str(c)))
        for row in sorted(X[col]):
            cols = _select(X, Y, row)
            prefix.append(row)
            walk(d + 1, prefix)
            prefix.pop()
            _deselect(X, Y, row, cols)

    walk(0, [])
    return out


def pentomino_count_distributed(
    spark: SparkSession, width: int = 20, height: int = 3, depth: int = 2
) -> DataFrame:
    """Distributed pentomino tiling count
    (EX/dancing/DistributedPentomino.java:91-120): the driver enumerates
    consistent depth-``depth`` search prefixes (tiny — the matrix build
    is O(placements)), each task replays its prefix and exhausts the
    subtree with Algorithm X, and the per-subtree solution counts sum.
    Disjoint prefixes guarantee no double count. One narrow map + one
    scalar agg — zero shuffles beyond the final 1-row reduce, and the
    fan-out scales to any executor count by raising ``depth``."""
    branches = pentomino_branches(width, height, depth)
    schema = T.StructType([T.StructField("n", T.LongType())])
    if not branches:
        # a board no prefix survives (e.g. area != 60) tiles zero ways
        return spark.createDataFrame([(0,)], "n_solutions bigint")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        X, Y = pentomino_matrix(width, height)
        for pdf in batches:
            counts = []
            for prefix_csv in pdf["prefix"]:
                prefix = [int(p) for p in prefix_csv.split(",")] if prefix_csv else []
                sel = [_select(X, Y, r) for r in prefix]
                counts.append(_algox_count(X, Y))
                for r, cols in zip(reversed(prefix), reversed(sel)):
                    _deselect(X, Y, r, cols)
            yield pd.DataFrame({"n": counts})

    # parallelize with explicit slices instead of repartition(): no shuffle
    # stage; contiguous slices are safe because depth levels the subtree
    # sizes (measured max 83ms at depth 4 vs 443ms at depth 2)
    rows = [(",".join(map(str, b)),) for b in branches]
    rdd = spark.sparkContext.parallelize(rows, min(len(rows), 32))
    branch_df = spark.createDataFrame(rdd, T.StructType([T.StructField("prefix", T.StringType())]))
    from pyspark.sql import functions as F

    return branch_df.mapInPandas(kernel, schema).agg(
        F.sum("n").cast("bigint").alias("n_solutions")
    )
