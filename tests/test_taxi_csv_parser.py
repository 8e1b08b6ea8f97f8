"""Golden parser fixtures for the taxi CSV wire format (S3; FIXTURES.md §1,
reference: datatypes/TaxiRide.scala:68-90): 7-token rows, START/END flags,
empty-numeric -> 0.0 defaults, FAILFAST on malformed rows."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

import pytest

from flink_streaming_demo_spark.sources.taxi import read_taxi_rides_csv

GOOD_CSV = """\
1,2013-01-01 00:00:00,START,-73.99,40.75,2,-1.0
1,2013-01-01 00:10:30,END,-73.95,40.78,2,3.2
2,2013-01-01 00:01:00,START,,,1,-1.0
2,2013-01-01 00:05:00,END,-73.90,40.70,1,
"""


def _write(tmpdir: str, name: str, content: str) -> str:
    path = os.path.join(tmpdir, name)
    with open(path, "w") as f:
        f.write(content)
    return path


@pytest.fixture(scope="module")
def parsed(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "rides.csv", GOOD_CSV)
        rows = {
            (r.ride_id, r.is_start): r
            for r in read_taxi_rides_csv(spark, path).collect()
        }
    return rows


def test_types_and_flags(parsed):
    start = parsed[(1, True)]
    end = parsed[(1, False)]
    assert start.ts == datetime(2013, 1, 1, 0, 0, 0)
    assert end.ts == datetime(2013, 1, 1, 0, 10, 30)
    assert start.travel_dist == pytest.approx(-1.0)
    assert end.travel_dist == pytest.approx(3.2)
    assert end.passenger_cnt == 2


def test_empty_numeric_defaults(parsed):
    # Empty lon/lat -> 0.0 (reference: datatypes/TaxiRide.scala:79-80);
    # empty travelDist -> 0.0 (reference: datatypes/TaxiRide.scala:82).
    start2 = parsed[(2, True)]
    assert start2.lon == 0.0 and start2.lat == 0.0
    end2 = parsed[(2, False)]
    assert end2.travel_dist == 0.0


def test_malformed_row_failfast(spark):
    # Non-numeric field must fail the read (reference: TaxiRide.scala:86-89).
    with tempfile.TemporaryDirectory() as d:
        path = _write(
            d, "bad.csv", "1,2013-01-01 00:00:00,START,not_a_number,40.75,2,-1.0\n"
        )
        with pytest.raises(Exception):
            read_taxi_rides_csv(spark, path).collect()
