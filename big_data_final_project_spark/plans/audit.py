"""Physical-plan auditing (SCALE.md evidence; SURVEY.md §4 stance).

The engine relies on Catalyst for optimization — this module is how
that reliance stays *checked* rather than assumed: tests assert that
the plans actually contain the shapes the scale posture depends on
(pushed filters, pruned scans, broadcast dimensions, no accidental
cartesian products), so a refactor that silently loses a pushdown
fails CI instead of shipping a 100x regression to the cluster.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanFacts:
    text: str

    def _nodes(self, name: str) -> int:
        """Count physical nodes by their '(id) Name' detail headers —
        formatted explain prints each node twice (tree + detail), so
        a raw substring count would double-count."""
        return len(re.findall(rf"^\(\d+\) +{name}", self.text, re.MULTILINE))

    @property
    def broadcast_joins(self) -> int:
        return self._nodes("BroadcastHashJoin")

    @property
    def sortmerge_joins(self) -> int:
        return self._nodes("SortMergeJoin")

    @property
    def cartesian_products(self) -> int:
        return self._nodes("CartesianProduct")

    @property
    def shuffles(self) -> int:
        # the anchored pattern already excludes BroadcastExchange
        return self._nodes("Exchange")

    def pushed_filters(self, *fragments: str) -> bool:
        """True if every fragment appears inside some PushedFilters list."""
        pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", self.text))
        return all(f in pushed for f in fragments)

    def read_schema_columns(self) -> set[str]:
        cols: set[str] = set()
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", self.text):
            for field in m.group(1).split(","):
                if ":" in field:
                    cols.add(field.split(":")[0].strip())
        return cols


def audit(df: DataFrame) -> PlanFacts:
    return PlanFacts(formatted_plan(df))
