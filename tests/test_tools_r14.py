"""Round-14 tool-level units: the status-store metric parser behind
scale_audit's streaming rows (formatted SQLMetric strings -> integers)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from scale_audit import _parse_metric_value  # noqa: E402


def test_parse_plain_sum():
    assert _parse_metric_value("1,234") == 1234
    assert _parse_metric_value("0") == 0


def test_parse_size_units():
    assert _parse_metric_value("0.0 B") == 0
    assert _parse_metric_value("210.8 KiB") == int(210.8 * 1024)
    assert _parse_metric_value("64.5 MiB") == int(64.5 * 1024**2)
    assert _parse_metric_value("2.0 GiB") == 2 * 1024**3


def test_parse_total_min_med_max_block():
    text = (
        "total (min, med, max (stageId: taskId))\n"
        "8.0 MiB (256.0 KiB, 256.0 KiB, 256.0 KiB (stage 0.0: task 25))"
    )
    assert _parse_metric_value(text) == 8 * 1024**2


def test_parse_timing_and_garbage_return_none():
    assert _parse_metric_value("164 ms") is None
    assert _parse_metric_value("") is None
    assert _parse_metric_value("n/a values here") is None
