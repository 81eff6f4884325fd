"""Worker→driver callbacks for transform() (reference: fugue/rpc/base.py
NativeRPCServer + flask.py FlaskRPCServer — handlers live on the driver,
pickled client stubs are invoked from executors).

Spark has no built-in executor→driver RPC for Python UDFs, so this is a
tiny length-prefixed-pickle TCP server on the driver; the client stub
(host, port, key) is cloudpickled into the UDF closure. One connection per
call — callbacks are control-plane (progress, sampling, early metrics),
not data-plane, so throughput is irrelevant and robustness wins.

Cluster-safety:

* Every message is authenticated with a per-server random HMAC-SHA256 key
  before it is unpickled — an unauthenticated peer cannot reach
  ``pickle.loads`` (which would otherwise be remote code execution). The
  key travels only inside the Spark task closure, which is the same trust
  channel as the user's UDF code itself.
* The stub advertises a routable driver address: ``spark.driver.host``
  when a SparkSession is active (executors on other nodes must not dial
  127.0.0.1), else the bind address.
"""

from __future__ import annotations

import hashlib
import hmac
import pickle
import secrets
import socket
import socketserver
import struct
import threading
from typing import Any, Callable

__all__ = [
    "RPCServer",
    "RPCClient",
    "HTTPRPCServer",
    "HTTPRPCClient",
    "RPCHandler",
    "EmptyRPCHandler",
    "to_rpc_handler",
    "make_rpc_server",
    "start_callback_server",
]

_MAC_LEN = hashlib.sha256().digest_size


def _send_msg(sock: socket.socket, obj: Any, key: bytes) -> None:
    data = pickle.dumps(obj)
    mac = hmac.new(key, data, hashlib.sha256).digest()
    sock.sendall(struct.pack(">I", len(data) + _MAC_LEN) + mac + data)


def _recv_msg(sock: socket.socket, key: bytes) -> Any:
    header = _recv_exact(sock, 4)
    (n,) = struct.unpack(">I", header)
    if n < _MAC_LEN:
        raise ConnectionError("rpc message too short")
    payload = _recv_exact(sock, n)
    mac, data = payload[:_MAC_LEN], payload[_MAC_LEN:]
    if not hmac.compare_digest(mac, hmac.new(key, data, hashlib.sha256).digest()):
        # authenticate BEFORE unpickling: a forged frame never reaches loads
        raise ConnectionError("rpc message failed authentication")
    return pickle.loads(data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("rpc peer closed")
        buf += chunk
    return buf


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        key = self.server.auth_key  # type: ignore[attr-defined]
        try:
            name, args, kwargs = _recv_msg(self.request, key)
            fn = self.server.handlers.get(name)  # type: ignore[attr-defined]
            if fn is None:
                _send_msg(self.request, ("error", f"no handler {name!r}"), key)
                return
            try:
                res = fn(*args, **kwargs)
                _send_msg(self.request, ("ok", res), key)
            except Exception as ex:  # noqa: BLE001 - ship the error to the worker
                _send_msg(self.request, ("error", repr(ex)), key)
        except (ConnectionError, EOFError):
            pass


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def _driver_host(bind_host: str) -> str:
    """The address executors should dial: spark.driver.host when a session
    is active (multi-node clusters), else the bind address."""
    try:
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        if session is not None:
            host = session.conf.get("spark.driver.host", None)
            if host:
                return host
    except Exception:  # pragma: no cover - no active JVM
        pass
    return "127.0.0.1" if bind_host == "0.0.0.0" else bind_host


class RPCServer:
    """Driver-side callback server; register handlers, then hand
    ``client()`` stubs to worker closures. Binds all interfaces by default
    so executors on other nodes can connect; every frame is HMAC-gated."""

    def __init__(self, host: str = "0.0.0.0"):
        self._bind_host = host
        self._srv = _Server((host, 0), _Handler)
        self._srv.handlers = {}  # type: ignore[attr-defined]
        self._srv.auth_key = secrets.token_bytes(32)  # type: ignore[attr-defined]
        self._thread: "threading.Thread | None" = None

    def register(self, name: str, fn: Callable) -> "RPCServer":
        self._srv.handlers[name] = fn  # type: ignore[attr-defined]
        return self

    def start(self) -> "RPCServer":
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address  # type: ignore[return-value]

    def client(self, name: str) -> "RPCClient":
        _, port = self.address
        host = _driver_host(self._bind_host)
        return RPCClient(host, port, name, self._srv.auth_key)  # type: ignore[attr-defined]

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class RPCClient:
    """Picklable stub: calling it connects to the driver and runs the
    registered handler there. Carries the per-server HMAC key (shipped
    only inside the Spark task closure)."""

    def __init__(self, host: str, port: int, name: str, key: bytes):
        self.host, self.port, self.name, self.key = host, port, name, key

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        with socket.create_connection((self.host, self.port), timeout=30) as s:
            _send_msg(s, (self.name, args, kwargs), self.key)
            status, payload = _recv_msg(s, self.key)
        if status == "error":
            raise RuntimeError(f"rpc handler failed: {payload}")
        return payload


class HTTPRPCServer:
    """HTTP transport variant (reference: fugue/rpc/flask.py
    FlaskRPCServer) on stdlib http.server — for environments where only
    HTTP traffic crosses the executor→driver boundary (proxies, service
    meshes, strict egress rules).

    Differences from the reference's Flask transport, both deliberate:
    payloads are JSON-only (the reference also uses JSON — no pickle means
    no deserialization RCE surface at all), and every request carries an
    HMAC-SHA256 over the body with the per-server random key (the
    reference transport is unauthenticated and warns about it; here a
    forged request is rejected before dispatch)."""

    def __init__(self, host: str = "0.0.0.0"):
        import http.server
        import json as _json

        self._bind_host = host
        handlers: dict[str, Callable] = {}
        auth_key = secrets.token_bytes(32)

        class _HTTPHandler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a: Any) -> None:  # quiet
                pass

            def do_POST(self) -> None:
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(n)
                    name = self.headers.get("X-Fugue-Name", "")
                    mac = self.headers.get("X-Fugue-MAC", "")
                    want = hmac.new(
                        auth_key, name.encode() + b"\0" + body, hashlib.sha256
                    ).hexdigest()
                    if not hmac.compare_digest(mac, want):
                        self._reply(403, {"status": "error", "error": "bad mac"})
                        return
                    fn = handlers.get(name)
                    if fn is None:
                        self._reply(
                            404, {"status": "error", "error": f"no handler {name!r}"}
                        )
                        return
                    payload = _json.loads(body or b"{}")
                    try:
                        res = fn(*payload.get("args", []), **payload.get("kwargs", {}))
                        self._reply(200, {"status": "ok", "result": res})
                    except Exception as ex:  # noqa: BLE001 - ship to worker
                        self._reply(200, {"status": "error", "error": repr(ex)})
                except Exception:  # noqa: BLE001 - malformed request
                    try:
                        self._reply(400, {"status": "error", "error": "bad request"})
                    except Exception:
                        pass

            def _reply(self, code: int, obj: dict) -> None:
                data = _json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._srv = http.server.ThreadingHTTPServer((host, 0), _HTTPHandler)
        self._srv.daemon_threads = True
        self._handlers = handlers
        self._auth_key = auth_key
        self._thread: "threading.Thread | None" = None

    def register(self, name: str, fn: Callable) -> "HTTPRPCServer":
        self._handlers[name] = fn
        return self

    def start(self) -> "HTTPRPCServer":
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address  # type: ignore[return-value]

    def client(self, name: str) -> "HTTPRPCClient":
        _, port = self.address
        return HTTPRPCClient(_driver_host(self._bind_host), port, name, self._auth_key)

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class HTTPRPCClient:
    """Picklable HTTP stub (stdlib urllib): JSON-serializable args only —
    callbacks are control-plane messages, which is exactly JSON's fit."""

    def __init__(self, host: str, port: int, name: str, key: bytes):
        self.host, self.port, self.name, self.key = host, port, name, key

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        import json as _json
        import urllib.request

        body = _json.dumps({"args": list(args), "kwargs": kwargs}).encode()
        mac = hmac.new(
            self.key, self.name.encode() + b"\0" + body, hashlib.sha256
        ).hexdigest()
        req = urllib.request.Request(
            f"http://{self.host}:{self.port}/invoke",
            data=body,
            headers={
                "Content-Type": "application/json",
                "X-Fugue-Name": self.name,
                "X-Fugue-MAC": mac,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = _json.loads(resp.read())
        if out.get("status") != "ok":
            raise RuntimeError(f"rpc handler failed: {out.get('error')}")
        return out.get("result")


_SERVERS: list[Any] = []  # keep alive for the app's lifetime


class RPCHandler:
    """Callable callback-handler base (reference: fugue/rpc/base.py
    ``RPCHandler`` — start/stop lifecycle + ``__call__``). The engine's
    callback channel accepts any callable; subclassing this adds the
    start/stop hooks the reference exposes."""

    def __init__(self):
        self._started = False

    @property
    def running(self) -> bool:
        return self._started

    def start_handler(self) -> None:
        pass

    def stop_handler(self) -> None:
        pass

    def start(self) -> "RPCHandler":
        if not self._started:
            self.start_handler()
            self._started = True
        return self

    def stop(self) -> None:
        if self._started:
            self.stop_handler()
            self._started = False

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        raise NotImplementedError

    def __enter__(self) -> "RPCHandler":
        return self.start()

    def __exit__(self, *ex: Any) -> None:
        self.stop()


class EmptyRPCHandler(RPCHandler):
    """The no-callback placeholder (reference: fugue/rpc/base.py)."""

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        raise ValueError("EmptyRPCHandler: no callback handler was provided")


class _FuncRPCHandler(RPCHandler):
    def __init__(self, fn: Callable):
        super().__init__()
        self._fn = fn

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self._fn(*args, **kwargs)


def to_rpc_handler(obj: Any) -> RPCHandler:
    """Coerce None/callable/handler to an :class:`RPCHandler`
    (reference: fugue/rpc/base.py ``to_rpc_handler``)."""
    if obj is None:
        return EmptyRPCHandler()
    if isinstance(obj, RPCHandler):
        return obj
    if callable(obj):
        return _FuncRPCHandler(obj)
    raise ValueError(f"cannot convert {obj!r} to an RPCHandler")


def make_rpc_server(conf: "dict | None" = None) -> RPCServer:
    """Build (not start) a callback server from conf (reference:
    fugue/rpc/base.py ``make_rpc_server``; conf key ``fugue.rpc.server``
    selects the transport — ``http`` for the HTTP/JSON transport)."""
    transport = str((conf or {}).get("fugue.rpc.server", "tcp")).lower()
    return HTTPRPCServer() if "http" in transport else RPCServer()


def start_callback_server(
    handler: Callable, name: str = "callback", transport: str = "tcp"
):
    """One-liner used by transform(callback=...): returns the worker stub.
    ``transport='http'`` selects the HTTP/JSON transport (off-box executors
    behind HTTP-only network policies)."""
    cls = HTTPRPCServer if transport == "http" else RPCServer
    srv = cls().register(name, handler).start()
    _SERVERS.append(srv)
    return srv.client(name)
