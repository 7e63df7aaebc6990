"""Flight serving edge: localhost round-trip against a temp store
(reference pkg/flight/server.go DoPut/DoGet/actions) + the /metrics HTTP
exposition (pkg/metrics/metrics.go:56-99)."""

import json
import urllib.request
from datetime import datetime

import pyarrow as pa
import pyarrow.flight as fl
import pytest

from featherstore_ray.catalog import FeatherStore
from featherstore_ray.flight import FeatherFlightServer, MetricsHTTPServer, connect

SCHEMA = {
    "entity_id": "string",
    "timestamp": "timestamp[us]",
    "feature1": "float64",
}


def _batch(entities, ts, f1):
    return pa.table({
        "entity_id": pa.array(entities, pa.string()),
        "timestamp": pa.array(
            [datetime.fromisoformat(t) for t in ts], pa.timestamp("us")),
        "feature1": pa.array(f1, pa.float64()),
    })


@pytest.fixture()
def server(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "store")
    srv = FeatherFlightServer(store)
    yield srv
    srv.shutdown()


def test_flight_roundtrip(server):
    client = connect(server.port)

    # create via action
    client.do_action(fl.Action("create_feature_set", json.dumps({
        "name": "fs1", "features": SCHEMA, "description": "flight test",
    }).encode()))
    names = [r.body.to_pybytes().decode()
             for r in client.do_action(fl.Action("list_feature_sets", b""))]
    assert names == ["fs1"]

    # DoPut → ingest
    t = _batch(
        ["a", "a", "b"],
        ["2024-01-01T00:00:00", "2024-01-02T00:00:00", "2024-01-01T12:00:00"],
        [1.0, 2.0, 3.0],
    )
    desc = fl.FlightDescriptor.for_path("fs1")
    writer, _ = client.do_put(desc, t.schema)
    writer.write_table(t)
    writer.close()

    # schema + discovery
    assert client.get_schema(desc).schema.equals(
        server.store.schema("fs1"))
    infos = list(client.list_flights())
    assert len(infos) == 1

    # DoGet latest-per-entity (the reference entity_ids ticket)
    ticket = fl.Ticket(json.dumps(
        {"feature_set": "fs1", "entity_ids": ["a", "b"]}).encode())
    got = client.do_get(ticket).read_all().to_pandas().sort_values(
        "entity_id").reset_index(drop=True)
    assert list(got["entity_id"]) == ["a", "b"]
    assert list(got["feature1"]) == [2.0, 3.0]  # latest row per entity

    # DoGet history (entity_id + time-range ticket)
    hist_ticket = fl.Ticket(json.dumps({
        "feature_set": "fs1", "entity_id": "a",
        "start_time": "2024-01-01T00:00:00",
        "end_time": "2024-01-03T00:00:00",
    }).encode())
    hist = client.do_get(hist_ticket).read_all().to_pandas()
    assert len(hist) == 2 and set(hist["feature1"]) == {1.0, 2.0}

    # delete via action
    client.do_action(fl.Action("delete_feature_set", b"fs1"))
    names = [r.body.to_pybytes().decode()
             for r in client.do_action(fl.Action("list_feature_sets", b""))]
    assert names == []


def test_flight_bad_ticket_and_unknown_action(server):
    client = connect(server.port)
    with pytest.raises(fl.FlightServerError):
        client.do_get(fl.Ticket(b"not json")).read_all()
    with pytest.raises(fl.FlightServerError):
        list(client.do_action(fl.Action("nope", b"")))


def test_metrics_http_exposition(ray_session):
    from featherstore_ray import metrics

    metrics.record("flight.test", rows=7, nbytes=11, seconds=0.5)
    with MetricsHTTPServer() as srv:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=10
        ).read().decode()
        assert 'featherstore_rows_total{op="flight.test"} 7' in body
        assert "# TYPE featherstore_rows_total counter" in body
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/other", timeout=10)
