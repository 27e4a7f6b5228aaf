"""HTTP facade: the reference's exact route table on stdlib http.server.

Route-for-route parity with ``main.go:24-37`` (S1/S2 + every handler in
``handlers.go``), JSON in/out, backed by :class:`tickdb_spark.api.TickDB`.
Stdlib-only because this container ships no web framework; a production
deployment would put the same TickDB calls behind FastAPI/gunicorn — the
engine layer is identical.

Routes (reference file:line in parentheses):

    GET    /                        server info        (handlers.go:15-21)
    GET    /_all_dbs                list databases     (handlers.go:53-55)
    PUT    /{db}                    create database    (handlers.go:23-32)
    GET    /{db}                    database info      (handlers.go:34-41)
    DELETE /{db}/_all               drop database      (handlers.go:43-51)
    POST   /{db}                    ingest doc batch   (handlers.go:57-77)
    POST   /{db}/_query             aggregate query    (handlers.go:79-96)
    GET    /{db}/{index}/{time}     exact point get    (handlers.go:98-113)
    DELETE /{db}/{index}/_all       drop index         (handlers.go:115-124)
    DELETE /{db}/{index}            range delete       (handlers.go:126-166)
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from tickdb_spark.api import TickDB
from tickdb_spark.catalog import DatabaseExistsError, DatabaseNotFoundError

_SEG = r"([^/_][^/]*)"
_ROUTES: list[tuple[str, str, str]] = [
    ("GET", r"^/$", "server_info"),
    ("GET", r"^/_all_dbs$", "list_dbs"),
    ("PUT", rf"^/{_SEG}$", "create_db"),
    ("GET", rf"^/{_SEG}$", "db_info"),
    ("DELETE", rf"^/{_SEG}/_all$", "drop_db"),
    ("POST", rf"^/{_SEG}$", "ingest"),
    ("POST", rf"^/{_SEG}/_query$", "query"),
    ("GET", rf"^/{_SEG}/{_SEG}/([^/]+)$", "point_get"),
    ("DELETE", rf"^/{_SEG}/{_SEG}/_all$", "drop_index"),
    ("DELETE", rf"^/{_SEG}/{_SEG}$", "range_delete"),
]


class TickDBServer:
    """Wraps a TickDB in an HTTP server. ``with TickDBServer(tdb) as s:``
    serves on an ephemeral port at ``s.url``."""

    def __init__(self, tdb: TickDB, host: str = "127.0.0.1", port: int = 0):
        self.tdb = tdb
        handler = _make_handler(tdb)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.url = f"http://{host}:{self.httpd.server_address[1]}"
        self._thread: threading.Thread | None = None

    def __enter__(self) -> "TickDBServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def _make_handler(tdb: TickDB):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else None

        def _dispatch(self, method: str) -> None:
            path = unquote(self.path)
            for m, pattern, action in _ROUTES:
                if m != method:
                    continue
                match = re.match(pattern, path)
                if not match:
                    continue
                try:
                    self._handle(action, *match.groups())
                except (DatabaseNotFoundError, KeyError) as e:
                    self._reply(404, {"error": str(e)})
                except DatabaseExistsError as e:
                    self._reply(412, {"error": f"database exists: {e}"})
                except (ValueError, TypeError) as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # engine errors propagate as 500 (B10 fixed)
                    self._reply(500, {"error": str(e)})
                return
            self._reply(404, {"error": "no route"})

        def _handle(self, action: str, *args) -> None:
            if action == "server_info":
                self._reply(200, tdb.server_info())
            elif action == "list_dbs":
                self._reply(200, tdb.list_dbs())
            elif action == "create_db":
                tdb.create_db(args[0])
                self._reply(201, {"ok": True})
            elif action == "db_info":
                self._reply(200, tdb.db_info(args[0]))
            elif action == "drop_db":
                tdb.drop_db(args[0])
                self._reply(200, {"ok": True})
            elif action == "ingest":
                docs = self._body()
                if not isinstance(docs, list):
                    raise ValueError("body must be a JSON array of docs")
                seq = tdb.put(args[0], docs)
                self._reply(201, {"ok": True, "ingest_seq": seq})
            elif action == "query":
                spec = self._body()
                rows = [r.asDict() for r in tdb.query(args[0], spec).collect()]
                self._reply(200, rows)
            elif action == "point_get":
                value = tdb.get(args[0], args[1], args[2])
                if value is None:
                    self._reply(404, {"error": "not found"})
                else:
                    self._reply(200, value)
            elif action == "drop_index":
                tdb.drop_index(args[0], args[1])
                self._reply(200, {"ok": True})
            elif action == "range_delete":
                body = self._body() or {}
                tdb.delete(args[0], args[1], body["from"], body["to"])
                self._reply(200, {"ok": True})

        def do_GET(self):
            self._dispatch("GET")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler
