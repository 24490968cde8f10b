"""Report/chart layer (SURVEY §3.4 — tool:1213-1357).

The reference builds Bar/Line/Pie charts from the *entire* cached
result set client-side. Here the aggregation runs as a DataFrame op
(AGG-01/02) and only the small aggregate is collected; rendering and
PNG/PDF export are gated on matplotlib (not in this image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHART_TYPES = ("Bar Graph", "Line Graph", "Pie Chart")  # tool:1036


class ReportError(Exception):
    pass


def _numeric(df: DataFrame, col: str) -> bool:
    # tool:1241-1243 — numeric-dtype gate for Bar/Line Y axes
    return dict(df.dtypes)[col] in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or dict(df.dtypes)[col].startswith("decimal")


def report_data(df: DataFrame, chart: str, x_col: str, y_col: str):
    """Compute the (small) aggregate behind a chart; returns pandas.

    Pie: group-sum (tool:1261-1262) or value-counts when x==y
    (tool:1263-1264). Bar/Line: x vs numeric y, as-is.
    """
    if x_col not in df.columns or y_col not in df.columns:
        raise ReportError(f"Columns not found: {x_col}/{y_col}")  # tool:1236-1239
    if chart == "Pie Chart":
        if x_col == y_col:
            agg = (
                df.groupBy(x_col)
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.desc("count"), x_col)
            )
        else:
            if not _numeric(df, y_col):
                raise ReportError(f"Column '{y_col}' must be numeric")
            agg = df.groupBy(x_col).agg(F.sum(y_col).alias(y_col)).orderBy(x_col)
        return agg.toPandas()
    if chart in ("Bar Graph", "Line Graph"):
        if not _numeric(df, y_col):
            raise ReportError(f"Column '{y_col}' must be numeric")  # tool:1241-1243
        return df.select(x_col, y_col).toPandas()
    raise ReportError(f"Unknown chart type: {chart}")


def export_chart(pdf, chart: str, x_col: str, y_col: str, out_path: str) -> str:
    """Render + save PNG/PDF (SNK-03/04). Requires matplotlib."""
    try:
        import matplotlib
    except ImportError as e:
        raise ReportError(
            "chart export requires matplotlib (not installed in this image); "
            "report_data() still provides the aggregate"
        ) from e
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    if chart == "Pie Chart":
        ax.pie(pdf[pdf.columns[-1]], labels=pdf[x_col], autopct="%1.1f%%")
    elif chart == "Bar Graph":
        ax.bar(pdf[x_col].astype(str), pdf[y_col])
    else:
        ax.plot(pdf[x_col], pdf[y_col])
    ax.set_title(f"{chart}: {y_col} by {x_col}")
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
