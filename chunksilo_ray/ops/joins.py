"""Join operators Ray Data lacks natively: as-of join and range join,
composed from groupby().map_groups + in-group sorting (task brief "custom
operators": composition first, actor state only when semantics demand it).

Partitioning assumption (documented per the brief): both sides are
co-partitioned by the equality key (user_id) via the same groupby, so each
group holds every row needed for its joins; within a group, pandas
merge_asof / interval logic runs over ts-sorted frames (ray_guide.md as-of
join recipe)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def _events(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def asof_join_purchases_to_clicks(sf_dir: str) -> Dataset:
    """For every 'purchase' event, the most recent prior-or-equal 'click' by
    the same user (NULL when none): the canonical as-of join.

    Implemented as ONE groupby(user_id) over the tagged union of both sides
    — each group then splits left/right and runs pd.merge_asof. This is the
    composition path: one shuffle, no actor state."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if left.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "click_id": pd.Series([], dtype="float64"),
                    "ms_since_click": pd.Series([], dtype="float64"),
                }
            )
        merged = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["event_id", "ts"]].rename(columns={"event_id": "click_id"}),
            on="ts",
            direction="backward",
        )
        merged["ms_since_click"] = (
            (merged["ts"] - merged.merge(
                right[["event_id", "ts"]].rename(
                    columns={"event_id": "click_id", "ts": "click_ts"}
                ),
                on="click_id",
                how="left",
            )["click_ts"]).dt.total_seconds() * 1000.0
        ).round(3)
        out = merged.rename(columns={"event_id": "purchase_id"})[
            ["purchase_id", "user_id", "click_id", "ms_since_click"]
        ]
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def range_join_events_in_window(sf_dir: str, window_minutes: int = 5) -> Dataset:
    """Pairs of (purchase, click) by the same user with the click inside
    [purchase_ts - window, purchase_ts] — a bounded range join realized as
    per-group sorted interval scanning (no cartesian blowup: two pointers)."""
    gap = pd.Timedelta(minutes=window_minutes)
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        rows = []
        r_ts = right["ts"].tolist()
        r_id = right["event_id"].tolist()
        lo = 0
        for _, p in left.iterrows():
            while lo < len(r_ts) and r_ts[lo] < p["ts"] - gap:
                lo += 1
            j = lo
            while j < len(r_ts) and r_ts[j] <= p["ts"]:
                rows.append((int(p["event_id"]), int(p["user_id"]), int(r_id[j])))
                j += 1
        return pd.DataFrame(rows, columns=["purchase_id", "user_id", "click_id"]).astype(
            {"purchase_id": "int64", "user_id": "int64", "click_id": "int64"}
        ) if rows else pd.DataFrame(
            {
                "purchase_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "click_id": pd.Series([], dtype="int64"),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
