"""Field-selection DSL: the reference's projection mini-language.

Reference: MRC/mapreduce/lib/fieldsel/FieldSelectionHelper.java:30-69 —
a record is split on a separator; a spec like ``"4,3,0,1:6,5,1-3,7-"``
selects key fields (before ``:``) and value fields (after), where each
element is a 0-based field index, a closed range ``a-b``, or an open
range ``a-`` (field a to end). Key and value are re-joined with the
separator.

Here the spec compiles to pure Column expressions over ``split()`` —
a projection Catalyst can prune/push, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class FieldSpec:
    """Parsed one-side spec: list of (start, end) 0-based inclusive ranges;
    end=None means open-ended."""

    ranges: list[tuple[int, int | None]]

    @classmethod
    def parse(cls, spec: str) -> "FieldSpec":
        ranges: list[tuple[int, int | None]] = []
        if not spec:
            return cls(ranges)
        for part in spec.split(","):
            part = part.strip()
            if not part:
                continue
            if "-" in part:
                lo, hi = part.split("-", 1)
                ranges.append((int(lo), int(hi) if hi else None))
            else:
                i = int(part)
                ranges.append((i, i))
        return cls(ranges)

    def columns(self, fields: Column) -> list[Column]:
        """Columns extracting each range from a split-array column.

        Lines with fewer fields than the spec references yield empty
        output for the missing part (FieldSelectionHelper tolerance):
        the open-range slice length clamps at 0 (a negative length is a
        runtime error) and single-field access uses try_element_at
        (plain element_at throws under Spark 4's default ANSI mode)."""
        out = []
        for lo, hi in self.ranges:
            if hi is None:
                out.append(
                    F.slice(fields, lo + 1, F.greatest(F.lit(0), F.size(fields) - lo))
                )
            elif hi == lo:
                out.append(F.array(F.try_element_at(fields, F.lit(lo + 1))))
            else:
                out.append(F.slice(fields, lo + 1, hi - lo + 1))
        return out


def parse_spec(spec: str) -> tuple[FieldSpec, FieldSpec]:
    """Split a full ``keyspec:valuespec`` string (``:`` optional)."""
    if ":" in spec:
        k, v = spec.split(":", 1)
    else:
        k, v = spec, ""
    return FieldSpec.parse(k), FieldSpec.parse(v)


def field_select(
    df: DataFrame,
    line_col: str,
    spec: str,
    separator: str = "\t",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Apply a field-selection spec to a delimited line column, producing
    (key, value) string columns — FieldSelectionMapper/Reducer parity."""
    import re as _re

    kspec, vspec = parse_spec(spec)
    # re.escape: F.split treats the pattern as a regex; a literal '|' or
    # '.' separator would otherwise split on every character
    fields = F.split(F.col(line_col), _re.escape(separator))
    out = df
    sep = separator

    def joined(spec_: FieldSpec) -> Column:
        cols = spec_.columns(fields)
        if not cols:
            return F.lit("")
        return F.concat_ws(sep, F.flatten(F.array(*cols)))

    return out.withColumn(key_col, joined(kspec)).withColumn(value_col, joined(vspec))
