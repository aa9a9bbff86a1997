"""In-process HTTP fixtures: a deterministic fake Prometheus
``/api/v1/query_range`` and a recording fake ClickHouse HTTP endpoint."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def synth_series(start: int, end: int, step: int) -> list[dict]:
    """3 deterministic series with samples at the real Prometheus
    range-evaluation instants: ``start + k*step`` for k ≥ 0, ≤ end."""
    instants = list(range(start, end + 1, step))
    series = []
    for name, labels in [
        ("up", {"instance": "a:9100", "job": "node"}),
        ("node_load1", {"instance": "a:9100", "job": "node"}),
        ("http_requests_total", {"code": "200", "handler": "/api"}),
    ]:
        metric = {"__name__": name, **labels}
        values = [[t, str(float(t % 97))] for t in instants]
        series.append({"metric": metric, "values": values})
    return series


class FakeServers:
    """One HTTP server exposing both fake services:

    - ``GET /api/v1/query_range`` → deterministic matrix response
    - ``POST /?query=INSERT...``  → records (query, body) into .inserts
    """

    def __init__(self) -> None:
        self.inserts: list[tuple[str, bytes]] = []
        self.prom_requests: list[dict] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # noqa: D102
                pass

            def do_GET(self):  # noqa: N802
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/api/v1/query_range":
                    q = dict(urllib.parse.parse_qsl(parsed.query))
                    start = int(float(q["start"]))
                    end = int(float(q["end"]))
                    step = int(q["step"].rstrip("s"))
                    outer.prom_requests.append(q)
                    body = json.dumps(
                        {
                            "status": "success",
                            "data": {
                                "resultType": "matrix",
                                "result": synth_series(start, end, step),
                            },
                        }
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):  # noqa: N802
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                outer.inserts.append((q.get("query", ""), body))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> "FakeServers":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
