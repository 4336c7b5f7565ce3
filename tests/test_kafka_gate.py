"""Kafka option plumbing (no broker in this image — pure builders only)."""

import pytest

from frolyk_spark.tasks.kafka import build_sink_options, build_source_options
from frolyk_spark.tasks.offsets import LogicalOffset


def test_source_options_earliest():
    opts = build_source_options(
        {"brokers": ["b1:9092", "b2:9092"]}, "topic-a", "earliest",
        consumer={"max_offsets_per_trigger": 10000},
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "topic-a"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "10000"


def test_source_options_latest_default():
    opts = build_source_options({"brokers": "b:9092"}, "t", LogicalOffset.LATEST)
    assert opts["startingOffsets"] == "latest"
    assert "maxOffsetsPerTrigger" not in opts


def test_missing_brokers_raises():
    with pytest.raises(ValueError):
        build_source_options({}, "t", "latest")


def test_sink_options():
    assert build_sink_options({"brokers": "b:9092"}) == {
        "kafka.bootstrap.servers": "b:9092"
    }
