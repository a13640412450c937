"""Table export: checkpoint-error tables to .tex/.html/.csv/.xlsx.

Parity with reference `utils/file_process.py:6-77` (same column set, labels
and cell formats, so replication tables are directly comparable).
"""

from __future__ import annotations

from pathlib import Path

from pandas import DataFrame


def export_table_from_checkpoints_error(error_checkpoints, out: str):
    """Render the versus-exact checkpoint errors as a table file."""
    data = [
        {
            "iteration": cp["iteration"],
            "time": cp["time"],
            "kkt_error": cp["kkt_error"],
            "l1_error": cp["error"]["l1"],
            "l2_error": cp["error"]["l2"],
            "linf_error": cp["error"]["linf"],
        }
        for cp in error_checkpoints
    ]
    df = DataFrame(data).sort_values("iteration")
    err_cols = ["l1_error", "l2_error", "linf_error", "kkt_error"]
    df[err_cols] = df[err_cols].map(lambda x: f"{x:.2e}")
    df["time"] = df["time"].map(lambda x: f"{x:.2f}")
    df = df[["l1_error", "l2_error", "linf_error", "kkt_error", "iteration", "time"]]
    df.columns = ["L1", "L2", "L-Inf", "KKT", "Iteration", "Time (s)"]

    Path(out).parent.mkdir(parents=True, exist_ok=True)
    export_table(df, out_path=out)


def export_table(dataframe: DataFrame, out_path: str):
    out_path = Path(out_path)
    ext = out_path.suffix
    opts = {"index": False}
    if ext == ".tex":
        dataframe.to_latex(out_path, index_names=False, **opts)
    elif ext == ".html":
        dataframe.to_html(out_path, index_names=False, **opts)
    elif ext == ".csv":
        dataframe.to_csv(out_path, **opts)
    elif ext == ".xlsx":
        if dataframe.columns.nlevels > 1:
            opts["index"] = True
        dataframe.to_excel(out_path, **opts)
    else:
        print(f"Unsupported file format: {ext}")
        return
    print(f"Exported table: {out_path}")
