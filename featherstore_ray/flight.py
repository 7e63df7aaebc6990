"""Arrow Flight + Prometheus serving edge for :class:`FeatherStore`.

Wire-protocol parity for the reference deployment surface
(pkg/flight/server.go:242-448 DoGet/DoPut over gRPC, pkg/metrics/
metrics.go:56-99 + cmd/featherstore/main.go:21-128 ``/metrics``): a thin
optional ``pyarrow.flight`` server in front of the offline engine, so a
user replacing the reference still has a network protocol for ingest and
point lookups. The engine's own edges stay programmatic Arrow (SURVEY
S9/S10) — this module adds transport only, no second code path: DoPut →
``FeatherStore.ingest``, DoGet → ``get_features`` / ``get_feature_history``,
actions → the catalog verbs.

Ticket format mirrors the reference DoGet ticket struct
(pkg/flight/server.go:250-256), JSON:

- ``{"feature_set": s, "entity_ids": [...]}`` → latest row per entity
- ``{"feature_set": s, "entity_id": e, "start_time": iso, "end_time": iso}``
  → inclusive history

DoGet executes the Ray pipeline behind the lookup and streams the result —
point lookups are small by construction (rows per requested entity), so
materializing the reply table is the serving contract, not a scale hazard.

Ray must already be initialised by the host process; the server never
calls ``ray.init()``.
"""

from __future__ import annotations

import json
import threading
from typing import Any

import pyarrow as pa

try:  # optional transport dep — core engine never imports this module
    import pyarrow.flight as _flight
except ImportError as _e:  # pragma: no cover - flight ships with pyarrow here
    _flight = None
    _flight_err = _e

from featherstore_ray.catalog import FeatherStore


def _require_flight():
    if _flight is None:  # pragma: no cover
        raise ImportError(
            "pyarrow.flight is unavailable in this build; the Flight edge "
            "is optional — use FeatherStore programmatically instead"
        ) from _flight_err


def _dataset_to_table(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table(
            {f.name: pa.array([], f.type) for f in ds.schema().base_schema})
    return pa.concat_tables(batches)


class FeatherFlightServer(_flight.FlightServerBase if _flight else object):
    """In-process Flight server over one :class:`FeatherStore`.

    ``location="grpc://127.0.0.1:0"`` binds an ephemeral port (see
    ``.port``). Serve with ``.serve()`` (blocking) or just construct it —
    FlightServerBase starts the gRPC service on construction and
    ``.shutdown()``/context-manager exit stops it.
    """

    def __init__(self, store: FeatherStore,
                 location: str = "grpc://127.0.0.1:0", **kwargs):
        _require_flight()
        super().__init__(location, **kwargs)
        self.store = store

    # -- discovery (ListFlights/GetFlightInfo/GetSchema,
    #    server.go:111-240) -------------------------------------------------

    def _info(self, name: str) -> "_flight.FlightInfo":
        desc = _flight.FlightDescriptor.for_path(name)
        ticket = _flight.Ticket(
            json.dumps({"feature_set": name}).encode())
        ep = _flight.FlightEndpoint(ticket, [])
        return _flight.FlightInfo(
            self.store.schema(name), desc, [ep], -1, -1)

    def list_flights(self, context, criteria):
        for name in self.store.list_feature_sets():
            yield self._info(name)

    def get_flight_info(self, context, descriptor):
        return self._info(self._descriptor_name(descriptor))

    def get_schema(self, context, descriptor):
        return _flight.SchemaResult(
            self.store.schema(self._descriptor_name(descriptor)))

    @staticmethod
    def _descriptor_name(descriptor) -> str:
        if not descriptor.path:
            raise _flight.FlightServerError(
                "invalid flight descriptor: PATH with the feature-set name "
                "required")
        return descriptor.path[0].decode()

    # -- data plane (DoGet/DoPut, server.go:242-448) -------------------------

    def do_get(self, context, ticket):
        try:
            req = json.loads(ticket.ticket.decode())
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise _flight.FlightServerError(f"invalid ticket: {e}")
        name = req.get("feature_set")
        if not name:
            raise _flight.FlightServerError("ticket needs feature_set")
        if req.get("entity_id") is not None:
            from datetime import datetime

            def _ts(key):
                v = req.get(key)
                return datetime.fromisoformat(v) if v else None

            ds = self.store.get_feature_history(
                name, req["entity_id"], start=_ts("start_time"),
                end=_ts("end_time"),
            )
        elif req.get("entity_ids"):
            ds = self.store.get_features(
                name, req["entity_ids"], tiebreak=req.get("tiebreak"))
        else:
            # bare feature-set ticket (the ListFlights endpoint): full scan
            ds = self.store.dataset(name)
        return _flight.RecordBatchStream(_dataset_to_table(ds))

    def do_put(self, context, descriptor, reader, writer):
        name = self._descriptor_name(descriptor)
        table = reader.read_all()
        self.store.ingest(name, table)

    # -- management actions (server.go:451-630) ------------------------------

    _ACTIONS = {
        "create_feature_set": "Create a new feature set",
        "get_feature_set": "Get a feature set by name",
        "list_feature_sets": "List all feature sets",
        "delete_feature_set": "Delete a feature set",
    }

    def list_actions(self, context):
        return [
            _flight.ActionType(t, d) for t, d in sorted(self._ACTIONS.items())
        ]

    def do_action(self, context, action):
        body = action.body.to_pybytes() if action.body else b""
        if action.type == "create_feature_set":
            spec = json.loads(body.decode())
            meta = self.store.create_feature_set(
                spec["name"], spec["features"],
                description=spec.get("description", ""),
                tags=spec.get("tags", ()),
            )
            return [json.dumps(
                {"name": meta["name"], "created": True}).encode()]
        if action.type == "get_feature_set":
            name = self._action_name(body)
            meta = dict(self.store.get_feature_set(name))
            meta["schema"] = str(meta.pop("schema"))
            return [json.dumps(meta, default=str).encode()]
        if action.type == "list_feature_sets":
            return [n.encode() for n in self.store.list_feature_sets()]
        if action.type == "delete_feature_set":
            self.store.delete_feature_set(self._action_name(body))
            return [b"deleted"]
        raise _flight.FlightServerError(
            f"unknown action type: {action.type}")

    @staticmethod
    def _action_name(body: bytes) -> str:
        text = body.decode()
        try:
            parsed = json.loads(text)
        except json.JSONDecodeError:
            return text
        return parsed["name"] if isinstance(parsed, dict) else str(parsed)


def connect(port: int, host: str = "127.0.0.1") -> "_flight.FlightClient":
    _require_flight()
    return _flight.connect(f"grpc://{host}:{port}")


# -- Prometheus exposition (metrics.go:56-99 + main.go /metrics) -------------


class MetricsHTTPServer:
    """Serve :func:`featherstore_ray.metrics.dump_prometheus` over HTTP.

    ``GET /metrics`` → text exposition format; anything else → 404. Runs
    on a daemon thread; ``port=0`` binds ephemeral (see ``.port``).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from featherstore_ray import metrics

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib API name
                if self.path.rstrip("/") != "/metrics":
                    self.send_error(404)
                    return
                payload = metrics.dump_prometheus().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a: Any) -> None:  # silence stderr
                pass

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "MetricsHTTPServer":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
