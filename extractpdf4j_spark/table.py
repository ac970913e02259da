"""Extracted-table value object and CSV serialization.

Mirrors the reference's ``Table`` (helpers/Table.java:14-64) and
``CsvExporter`` (helpers/CsvExporter.java:14-50) semantics:

* a table is a rectangular grid of strings plus column/row boundary
  positions (pixels or points depending on the producing strategy),
* ``ncols`` is defined by the FIRST row (Table.java:31),
* CSV quoting: a field is quoted iff it contains the delimiter, a double
  quote, or a newline; embedded quotes double up (CsvExporter.java:38-43),
* ``to_csv`` emits '\n' line terminators with no trailing newline
  (Table.java:54-62 strips the trailing line separator).

Here a Table is a plain frozen dataclass — the Spark-side representation is
a row ``(cells array<array<string>>, col_bounds array<double>,
row_bounds array<double>)``; this object exists for the kernel/oracle
boundary and for tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Table:
    cells: list[list[str]] = field(default_factory=list)
    col_bounds: list[float] = field(default_factory=list)
    row_bounds: list[float] = field(default_factory=list)

    @property
    def nrows(self) -> int:
        return len(self.cells)

    @property
    def ncols(self) -> int:
        # First row defines the column count (Table.java:31).
        return 0 if not self.cells else len(self.cells[0])

    def cell(self, r: int, c: int) -> str:
        return self.cells[r][c]

    def to_csv(self, sep: str = ",") -> str:
        csv = export_csv([self], sep)
        return csv[: -1] if csv.endswith("\n") else csv


def export_csv(tables: list[Table], delimiter: str = ",") -> str:
    """CSV export across tables; validates the delimiter like
    CsvExporter.setDelimiter (CsvExporter.java:18-26)."""
    if delimiter is None or delimiter == "":
        raise ValueError("Delimiter cannot be null or empty")
    if len(delimiter) != 1:
        raise ValueError("Delimiter must be a single character")
    out: list[str] = []
    for t in tables:
        for r in range(t.nrows):
            row = []
            for c in range(t.ncols):
                v = t.cell(r, c)
                if v is None:
                    v = ""
                if delimiter in v or '"' in v or "\n" in v:
                    row.append('"' + v.replace('"', '""') + '"')
                else:
                    row.append(v)
            out.append(delimiter.join(row))
            out.append("\n")
    return "".join(out)
