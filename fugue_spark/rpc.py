"""Worker→driver callbacks for transform() (reference: fugue/rpc/base.py
NativeRPCServer + flask.py FlaskRPCServer — handlers live on the driver,
pickled client stubs are invoked from executors).

Spark has no built-in executor→driver RPC for Python UDFs, so this is a
tiny length-prefixed-pickle TCP server on the driver; the client stub
(host, port) is cloudpickled into the UDF closure. One connection per
call — callbacks are control-plane (progress, sampling, early metrics),
not data-plane, so throughput is irrelevant and robustness wins.
"""

from __future__ import annotations

import pickle
import socket
import socketserver
import struct
import threading
from typing import Any, Callable

__all__ = ["RPCServer", "RPCClient", "start_callback_server"]


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj)
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv_msg(sock: socket.socket) -> Any:
    header = _recv_exact(sock, 4)
    (n,) = struct.unpack(">I", header)
    return pickle.loads(_recv_exact(sock, n))


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
        try:
            name, args, kwargs = _recv_msg(self.request)
            fn = self.server.handlers.get(name)  # type: ignore[attr-defined]
            if fn is None:
                _send_msg(self.request, ("error", f"no handler {name!r}"))
                return
            try:
                res = fn(*args, **kwargs)
                _send_msg(self.request, ("ok", res))
            except Exception as ex:  # noqa: BLE001 - ship the error to the worker
                _send_msg(self.request, ("error", repr(ex)))
        except (ConnectionError, EOFError):
            pass


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class RPCServer:
    """Driver-side callback server; register handlers, then hand
    ``client()`` stubs to worker closures."""

    def __init__(self, host: str = "127.0.0.1"):
        self._srv = _Server((host, 0), _Handler)
        self._srv.handlers = {}  # type: ignore[attr-defined]
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
        host, port = self.address
        return RPCClient(host, port, name)

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class RPCClient:
    """Picklable stub: calling it connects to the driver and runs the
    registered handler there."""

    def __init__(self, host: str, port: int, name: str):
        self.host, self.port, self.name = host, port, name

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        with socket.create_connection((self.host, self.port), timeout=30) as s:
            _send_msg(s, (self.name, args, kwargs))
            status, payload = _recv_msg(s)
        if status == "error":
            raise RuntimeError(f"rpc handler failed: {payload}")
        return payload


_SERVERS: list[RPCServer] = []  # keep alive for the app's lifetime


def start_callback_server(handler: Callable, name: str = "callback") -> RPCClient:
    """One-liner used by transform(callback=...): returns the worker stub."""
    srv = RPCServer().register(name, handler).start()
    _SERVERS.append(srv)
    return srv.client(name)
