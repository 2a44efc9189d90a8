"""Metadata exploration — capability twin of the reference's
``pre_processing/explore_metadata.py`` (counts per disaster/split + an
optional interactive map of image extents; plotly is optional here).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd


def summarize_dataset_split(csv_path: str = "metadata/dataset_split.csv") -> pd.DataFrame:
    """Image counts per (disaster, split, version)."""
    df = pd.read_csv(csv_path)
    summary = (
        df.groupby(["disaster", "split", "version"]).size().rename("images").reset_index()
    )
    print(summary.to_string(index=False))
    return summary


def plot_extents_map(
    metadata_csv: str = "metadata/metadata.csv", out_html: Optional[str] = None
):
    """Scatter-map of image centers colored by disaster (requires plotly)."""
    try:
        import plotly.express as px
    except ImportError as e:  # plotly is not part of the runtime deps
        raise ImportError("plot_extents_map requires plotly (pip install plotly)") from e
    df = pd.read_csv(metadata_csv)
    df = df.assign(
        lat=(df["y_min"] + df["y_max"]) / 2, lon=(df["x_min"] + df["x_max"]) / 2
    )
    fig = px.scatter_geo(df, lat="lat", lon="lon", color="disaster", hover_name="image")
    if out_html:
        fig.write_html(out_html)
    return fig
