"""Minimal RFC 6455 WebSocket *server* for tests (stdlib only).

Implements just enough protocol to exercise the client/source behaviors
SURVEY.md §5.2 lists: records the subscription message received on connect,
emits configured frames, records periodic control messages, and can drop
the connection once to force the client's reconnect path.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class RecordingWsServer:
    """One-connection-at-a-time WS server recording everything it sees."""

    def __init__(self, frames_per_connection: list[bytes] | None = None,
                 drop_after_frames: int | None = None):
        self.received: list[bytes] = []          # all client data frames
        #: data frames per connection, in accept order. NB: frames sent just
        #: before an abrupt drop may be lost to the close/reader race —
        #: assert on connections the server keeps alive.
        self.received_per_conn: list[list[bytes]] = []
        self.connections = 0
        self.frames_per_connection = frames_per_connection or []
        #: if set, close the socket abruptly after sending this many frames
        #: on the FIRST connection (to test the 5 s reconnect loop).
        self.drop_after_frames = drop_after_frames
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self.url = f"ws://127.0.0.1:{self.port}/feed"
        self._stop = threading.Event()
        self._send_cv = threading.Condition()
        self._extra_frames: list[bytes] = []
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # -- test API -----------------------------------------------------------

    def push_frame(self, payload: bytes) -> None:
        """Queue an extra frame for the currently-connected client."""
        with self._send_cv:
            self._extra_frames.append(payload)
            self._send_cv.notify()

    def close(self) -> None:
        self._stop.set()
        with self._send_cv:
            self._send_cv.notify_all()
        try:
            self._sock.close()
        except OSError:
            pass

    # -- protocol -----------------------------------------------------------

    def _serve(self) -> None:
        # One thread per connection: a stale client (e.g. a stopped query's
        # reader whose ephemeral port got reused) must never occupy the
        # only serving slot and starve the connection under test.
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            self.connections += 1
            first = self.connections == 1
            threading.Thread(
                target=self._serve_one,
                args=(conn, first and self.drop_after_frames is not None),
                daemon=True,
            ).start()

    def _serve_one(self, conn: socket.socket, drop: bool) -> None:
        try:
            self._handle(conn, drop=drop)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _handle(self, conn: socket.socket, drop: bool) -> None:
        conn.settimeout(0.2)
        self._handshake(conn)
        conn_received: list[bytes] = []
        self.received_per_conn.append(conn_received)
        sent = 0
        reader = threading.Thread(
            target=self._read_loop, args=(conn, conn_received), daemon=True
        )
        reader.start()
        for payload in self.frames_per_connection:
            self._send_frame(conn, payload)
            sent += 1
            if drop and sent >= (self.drop_after_frames or 0):
                conn.close()  # abrupt drop — no close frame
                return
        while not self._stop.is_set():
            with self._send_cv:
                if not self._extra_frames:
                    self._send_cv.wait(timeout=0.2)
                frames, self._extra_frames = self._extra_frames, []
            for payload in frames:
                self._send_frame(conn, payload)
            if not reader.is_alive():
                return

    def _handshake(self, conn: socket.socket) -> None:
        import time as _time

        buf = b""
        deadline = _time.monotonic() + 10.0
        while b"\r\n\r\n" not in buf:
            try:
                chunk = conn.recv(4096)
            except socket.timeout:
                # the 0.2 s read timeout is for the post-handshake loop —
                # a slow-arriving upgrade request must not kill the conn
                if _time.monotonic() > deadline:
                    raise
                continue
            if not chunk:
                raise OSError("closed during handshake")
            buf += chunk
        key = ""
        for line in buf.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )

    def _read_loop(
        self, conn: socket.socket, conn_received: list[bytes] | None = None
    ) -> None:
        """Record client data frames; answer pings with pongs (RFC 6455
        §5.5.2-§5.5.3 — keeps idle clients from failing their keep-alive)."""
        buf = b""
        while not self._stop.is_set():
            try:
                chunk = conn.recv(4096)
            except socket.timeout:
                continue
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            buf = self._drain_frames(buf, conn, conn_received)

    def _drain_frames(
        self,
        buf: bytes,
        conn: socket.socket | None = None,
        conn_received: list[bytes] | None = None,
    ) -> bytes:
        while True:
            if len(buf) < 2:
                return buf
            b0, b1 = buf[0], buf[1]
            op = b0 & 0x0F
            masked = bool(b1 & 0x80)
            n = b1 & 0x7F
            idx = 2
            if n == 126:
                if len(buf) < 4:
                    return buf
                (n,) = struct.unpack(">H", buf[2:4])
                idx = 4
            elif n == 127:
                if len(buf) < 10:
                    return buf
                (n,) = struct.unpack(">Q", buf[2:10])
                idx = 10
            need = idx + (4 if masked else 0) + n
            if len(buf) < need:
                return buf
            if masked:
                mask = buf[idx: idx + 4]
                data = bytes(
                    b ^ mask[i % 4]
                    for i, b in enumerate(buf[idx + 4: idx + 4 + n])
                )
            else:
                data = buf[idx: idx + n]
            if op in (0x1, 0x2):  # text/binary
                self.received.append(data)
                if conn_received is not None:
                    conn_received.append(data)
            elif op == 0x9 and conn is not None:  # ping → pong, same payload
                header = bytearray([0x8A, len(data)])
                try:
                    conn.sendall(bytes(header) + data)
                except OSError:
                    pass
            buf = buf[need:]

    def _send_frame(self, conn: socket.socket, payload: bytes) -> None:
        # RFC 6455: text frames must be valid UTF-8 — send anything else
        # as a binary frame (FIN+0x2), as a real feed would
        try:
            payload.decode("utf-8")
            op = 0x81  # FIN + text
        except UnicodeDecodeError:
            op = 0x82  # FIN + binary
        header = bytearray([op])
        n = len(payload)
        if n < 126:
            header.append(n)
        elif n < 1 << 16:
            header.append(126)
            header += struct.pack(">H", n)
        else:
            header.append(127)
            header += struct.pack(">Q", n)
        conn.sendall(bytes(header) + payload)
