"""Dashboard assets stay in sync with the engine.

The reference ships Grafana + Superset configs (docker/grafana/
dashboards/flink-dashboard.json, superset/README.md); ours live in
dashboards/. Inert JSON rots silently, so these tests pin the two
contracts that matter: every Grafana PromQL target matches a gauge
Structured Streaming actually publishes, and every column the Superset
README tells a user to chart exists in the registered query's output
schema.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from realtime_event_streaming_spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"

ROOT = Path(__file__).resolve().parent.parent
GRAFANA = ROOT / "dashboards" / "grafana" / "rtes-streaming-dashboard.json"
SUPERSET = ROOT / "dashboards" / "superset" / "README.md"

#: Gauges spark.sql.streaming.metricsEnabled registers per query
#: (Dropwizard names, dots/dashes sanitized the way PrometheusServlet
#: exports them). Public Spark surface: sql/core MetricsReporter.
_STREAMING_GAUGES = {
    "inputRate_total",
    "processingRate_total",
    "latency",
    "states_rowsTotal",
    "states_usedBytes",
    "eventTime_watermark",
}


def test_grafana_board_targets_real_streaming_gauges():
    board = json.loads(GRAFANA.read_text())
    assert board["refresh"] == "30s"  # reference parity: 30 s refresh
    panels = board["panels"]
    assert len(panels) >= 4
    for panel in panels:
        targets = panel.get("targets", [])
        assert targets, f"panel {panel['title']!r} has no targets"
        for t in targets:
            expr = t["expr"]
            m = re.search(
                r"_driver_spark_streaming_\.\*_([A-Za-z_]+)\\\"", expr
            ) or re.search(r"_driver_spark_streaming_\.\*_([A-Za-z_]+)", expr)
            assert m, f"target not a streaming-gauge matcher: {expr}"
            assert m.group(1) in _STREAMING_GAUGES, (
                f"panel {panel['title']!r} references unknown gauge "
                f"{m.group(1)!r}"
            )


def _documented_columns(section: str) -> set[str]:
    """Backticked column names in the README's 'Columns:' line for a
    dataset section."""
    text = SUPERSET.read_text()
    m = re.search(
        rf"### Dataset `{section}`\nColumns: (.+?)(?:\(|\n\n)",
        text,
        re.DOTALL,
    )
    assert m, f"Superset README lost its `{section}` dataset section"
    return set(re.findall(r"`([a-z_]+)`", m.group(1)))


def test_superset_datasets_match_query_schemas(spark):
    reg = load_all()
    for name in (
        "minute_rollup",
        "recent_activity",
        "filter_funnel_census",
        "source_ablation_contrast",
        "graph_ann_recall",
    ):
        actual = set(reg[name].spark_fn(spark, SF_SMOKE).columns)
        documented = _documented_columns(name)
        assert documented == actual, (
            f"{name}: README documents {sorted(documented)}, "
            f"query returns {sorted(actual)}"
        )
