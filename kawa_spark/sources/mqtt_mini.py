"""Minimal in-process MQTT 3.1.1 broker + client.

Purpose: the container has no paho-mqtt and no mosquitto, but the
reference's MQTT connector is conformance-tested against a live
broker (/root/reference/x/mqtt/mqtt.go:240-285 with the docker
mosquitto service; suite semantics in /root/reference/test/
suite_test.go:16-104 and stream_test.go:57-75). This module supplies
just enough real MQTT — actual 3.1.1 frames over actual TCP sockets —
to run the same conformance shape in-process: CONNECT/CONNACK,
SUBSCRIBE/SUBACK (exact, '+' and '#' filters), PUBLISH QoS 0/1 with
PUBACK and QoS 2 with the full exactly-once handshake
(PUBREC/PUBREL/PUBCOMP, inbound pids deduplicated until released),
PINGREQ/PINGRESP, DISCONNECT.

The client mirrors the paho surface kawa_spark.sources.mqtt uses
(connect / subscribe / on_message / loop_start / publish →
wait_for_publish / disconnect), so the Spark DataSource runs
unmodified against either implementation; paho is preferred when
installed (see mqtt._client_factory).

NOT a production broker: no retained messages, no persistent
sessions, no auth/TLS — deliberately, this is test infrastructure
with a real wire format, not a server.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

# packet types
CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
PUBREC, PUBREL, PUBCOMP = 5, 6, 7
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


# ---------------------------------------------------------------- codec


def _encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed")
        buf += chunk
    return buf


def _read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """→ (type, flags, body). Blocks; raises ConnectionError on EOF."""
    hdr = _read_exact(sock, 1)[0]
    length, shift = 0, 0
    while True:
        b = _read_exact(sock, 1)[0]
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 21:
            raise ValueError("malformed remaining length")
    body = _read_exact(sock, length) if length else b""
    return hdr >> 4, hdr & 0x0F, body


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + _encode_varint(len(body)) + body


def _mqtt_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _parse_str(body: bytes, at: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", body, at)
    return body[at + 2 : at + 2 + n].decode("utf-8"), at + 2 + n


def topic_matches(filt: str, topic: str) -> bool:
    """MQTT filter match: '+' one level, '#' trailing multi-level."""
    fp, tp = filt.split("/"), topic.split("/")
    for i, f in enumerate(fp):
        if f == "#":
            return True
        if i >= len(tp):
            return False
        if f != "+" and f != tp[i]:
            return False
    return len(fp) == len(tp)


# ---------------------------------------------------------------- broker


class _BrokerHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        broker: MiniBroker = self.server.broker  # type: ignore[attr-defined]
        sock = self.request
        send = broker.send  # serialized: handler + router share sockets
        subs: list[str] = []
        # QoS 2 inbound exactly-once state: pids PUBRECed but not yet
        # PUBRELed. A redelivered PUBLISH with a stored pid is acked
        # again but NOT re-routed — the broker-side half of the
        # exactly-once contract.
        inflight2: set[int] = set()
        try:
            while True:
                ptype, flags, body = _read_packet(sock)
                if ptype == CONNECT:
                    send(sock, _packet(CONNACK, 0, b"\x00\x00"))
                elif ptype == SUBSCRIBE:
                    (pid,) = struct.unpack_from(">H", body, 0)
                    at, granted = 2, bytearray()
                    while at < len(body):
                        filt, at = _parse_str(body, at)
                        qos = body[at]
                        at += 1
                        broker.add_subscriber(filt, sock, min(qos, 2))
                        subs.append(filt)
                        granted.append(min(qos, 2))
                    send(
                        sock,
                        _packet(SUBACK, 0, struct.pack(">H", pid) + bytes(granted)),
                    )
                elif ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    topic, at = _parse_str(body, 0)
                    if qos == 2:
                        (pid,) = struct.unpack_from(">H", body, at)
                        at += 2
                        if pid not in inflight2:
                            inflight2.add(pid)
                            broker.route(topic, body[at:], 2)
                        send(sock, _packet(PUBREC, 0, struct.pack(">H", pid)))
                    elif qos == 1:
                        (pid,) = struct.unpack_from(">H", body, at)
                        at += 2
                        send(sock, _packet(PUBACK, 0, struct.pack(">H", pid)))
                        broker.route(topic, body[at:], 1)
                    else:
                        broker.route(topic, body[at:], 0)
                elif ptype == PUBREL:
                    (pid,) = struct.unpack_from(">H", body, 0)
                    inflight2.discard(pid)
                    send(sock, _packet(PUBCOMP, 0, struct.pack(">H", pid)))
                elif ptype == PUBREC:
                    # subscriber PUBRECed an outbound QoS 2 delivery:
                    # release it (PUBREL carries flags 0x02 per 3.1.1)
                    (pid,) = struct.unpack_from(">H", body, 0)
                    send(sock, _packet(PUBREL, 0x02, struct.pack(">H", pid)))
                elif ptype in (PUBACK, PUBCOMP):
                    pass  # subscriber acks; no broker-side redelivery here
                elif ptype == PINGREQ:
                    send(sock, _packet(PINGRESP, 0, b""))
                elif ptype == DISCONNECT:
                    return
        except (ConnectionError, OSError):
            return
        finally:
            broker.drop_subscriber(sock)


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MiniBroker:
    """In-process MQTT broker on 127.0.0.1:<port> (0 = ephemeral)."""

    def __init__(self, port: int = 0) -> None:
        self._server = _Server(("127.0.0.1", port), _BrokerHandler)
        self._server.broker = self  # type: ignore[attr-defined]
        self.port: int = self._server.server_address[1]
        self._lock = threading.Lock()
        # filter → [(sock, qos)]
        self._subs: dict[str, list[tuple[socket.socket, int]]] = {}
        self._send_lock = threading.Lock()
        self._next_mid = 0
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def start(self) -> "MiniBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "MiniBroker":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def send(self, sock: socket.socket, data: bytes) -> None:
        """Serialize writes: a subscriber socket is written by both its
        handler thread (acks) and publisher threads (routed PUBLISH);
        interleaved partial sendalls would corrupt the frame stream."""
        with self._send_lock:
            sock.sendall(data)

    def add_subscriber(self, filt: str, sock: socket.socket, qos: int) -> None:
        with self._lock:
            self._subs.setdefault(filt, []).append((sock, qos))

    def drop_subscriber(self, sock: socket.socket) -> None:
        with self._lock:
            for filt in list(self._subs):
                self._subs[filt] = [
                    (s, q) for s, q in self._subs[filt] if s is not sock
                ]
                if not self._subs[filt]:
                    del self._subs[filt]

    def route(self, topic: str, payload: bytes, pub_qos: int = 1) -> None:
        """Deliver at effective QoS = min(subscription QoS, publish
        QoS), per 3.1.1 §3.8.4. QoS 2 deliveries run the outbound
        exactly-once handshake with the subscriber (its PUBREC is
        answered with PUBREL by the handler thread)."""
        with self._lock:
            targets = [
                (s, q)
                for filt, pairs in self._subs.items()
                if topic_matches(filt, topic)
                for s, q in pairs
            ]
            self._next_mid += 1
            mid = self._next_mid % 65535 or 1
        for sock, qos in targets:
            eff = min(qos, pub_qos)
            head = _mqtt_str(topic)
            if eff:
                head += struct.pack(">H", mid)
            try:
                self.send(sock, _packet(PUBLISH, eff << 1, head + payload))
            except OSError:
                pass  # dead subscriber; dropped on its handler exit


# ---------------------------------------------------------------- client


class MiniMessage:
    __slots__ = ("mid", "payload", "topic")

    def __init__(self, mid: int, payload: bytes, topic: str) -> None:
        self.mid, self.payload, self.topic = mid, payload, topic


class MiniMessageInfo:
    def __init__(self) -> None:
        self._event = threading.Event()

    def wait_for_publish(self, timeout: float | None = 30.0) -> None:
        if not self._event.wait(timeout):
            raise TimeoutError("PUBACK not received")

    def _done(self) -> None:
        self._event.set()


class MiniClient:
    """paho-shaped MQTT 3.1.1 client over a real socket."""

    def __init__(self, client_id: str = "") -> None:
        self.on_message = None
        self._sock: socket.socket | None = None
        self._client_id = client_id or f"mini-{id(self):x}"
        self._mid = 0
        self._lock = threading.Lock()
        self._pending: dict[int, MiniMessageInfo] = {}
        self._suback = threading.Event()
        self._connack = threading.Event()
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    # -- lifecycle

    def connect(self, host: str, port: int = 1883, keepalive: int = 60) -> None:
        self._sock = socket.create_connection((host, port), timeout=30)
        body = (
            _mqtt_str("MQTT")
            + bytes([4, 0x02])  # level 4, clean session
            + struct.pack(">H", keepalive)
            + _mqtt_str(self._client_id)
        )
        self._send(_packet(CONNECT, 0, body))
        # CONNACK is consumed by the reader loop if started, else inline
        if self._thread is None:
            ptype, _, _ = _read_packet(self._sock)
            if ptype != CONNACK:
                raise ConnectionError(f"expected CONNACK, got {ptype}")
            self._connack.set()

    def loop_start(self) -> None:
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def loop_stop(self) -> None:
        self._stop.set()

    def disconnect(self) -> None:
        try:
            if self._sock:
                self._send(_packet(DISCONNECT, 0, b""))
                self._sock.close()
        except OSError:
            pass
        self._stop.set()

    # -- ops

    def subscribe(self, topic: str, qos: int = 1, timeout: float = 30.0) -> None:
        mid = self._next_mid()
        body = struct.pack(">H", mid) + _mqtt_str(topic) + bytes([qos])
        self._suback.clear()
        self._send(_packet(SUBSCRIBE, 0x02, body))
        if self._thread is None:
            # no reader loop yet: consume SUBACK inline
            ptype, _, _ = _read_packet(self._sock)
            if ptype != SUBACK:
                raise ConnectionError(f"expected SUBACK, got {ptype}")
        else:
            if not self._suback.wait(timeout):
                raise TimeoutError("SUBACK not received")

    def publish(self, topic: str, payload, qos: int = 1) -> MiniMessageInfo:
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        info = MiniMessageInfo()
        head = _mqtt_str(topic)
        if qos:
            mid = self._next_mid()
            head += struct.pack(">H", mid)
            with self._lock:
                self._pending[mid] = info
        else:
            info._done()
        self._send(_packet(PUBLISH, qos << 1, head + bytes(payload)))
        if qos and self._thread is None:
            if qos == 2:
                # synchronous exactly-once: PUBREC → PUBREL → PUBCOMP
                ptype, _, body = _read_packet(self._sock)
                if ptype != PUBREC:
                    raise ConnectionError(f"expected PUBREC, got {ptype}")
                (amid,) = struct.unpack_from(">H", body, 0)
                self._send(_packet(PUBREL, 0x02, struct.pack(">H", amid)))
                ptype, _, body = _read_packet(self._sock)
                if ptype != PUBCOMP:
                    raise ConnectionError(f"expected PUBCOMP, got {ptype}")
            else:
                # synchronous mode: wait for PUBACK inline
                ptype, _, body = _read_packet(self._sock)
                if ptype != PUBACK:
                    raise ConnectionError(f"expected PUBACK, got {ptype}")
            (amid,) = struct.unpack_from(">H", body, 0)
            with self._lock:
                pend = self._pending.pop(amid, None)
            if pend:
                pend._done()
        return info

    # -- internals

    def _send(self, data: bytes) -> None:
        with self._lock:
            self._sock.sendall(data)

    def _next_mid(self) -> int:
        with self._lock:
            self._mid = self._mid % 65535 + 1
            return self._mid

    def _loop(self) -> None:
        # inbound QoS 2 exactly-once state (3.1.1 "method B"): the
        # message is held on PUBLISH/PUBREC and delivered to the
        # callback only when the sender releases it with PUBREL — a
        # redelivered PUBLISH with the same pid just overwrites the
        # held copy, so the callback can never fire twice for one pid.
        held2: dict[int, MiniMessage] = {}
        try:
            while not self._stop.is_set():
                ptype, flags, body = _read_packet(self._sock)
                if ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    topic, at = _parse_str(body, 0)
                    mid = 0
                    if qos == 2:
                        (mid,) = struct.unpack_from(">H", body, at)
                        at += 2
                        held2[mid] = MiniMessage(mid, body[at:], topic)
                        self._send(_packet(PUBREC, 0, struct.pack(">H", mid)))
                        continue
                    if qos:
                        (mid,) = struct.unpack_from(">H", body, at)
                        at += 2
                        self._send(_packet(PUBACK, 0, struct.pack(">H", mid)))
                    cb = self.on_message
                    if cb:
                        cb(self, None, MiniMessage(mid, body[at:], topic))
                elif ptype == PUBREL:
                    (mid,) = struct.unpack_from(">H", body, 0)
                    self._send(_packet(PUBCOMP, 0, struct.pack(">H", mid)))
                    msg = held2.pop(mid, None)
                    cb = self.on_message
                    if msg is not None and cb:
                        cb(self, None, msg)
                elif ptype == PUBREC:
                    # outbound QoS 2 step 2: release; PUBCOMP completes
                    (mid,) = struct.unpack_from(">H", body, 0)
                    self._send(_packet(PUBREL, 0x02, struct.pack(">H", mid)))
                elif ptype in (PUBACK, PUBCOMP):
                    (mid,) = struct.unpack_from(">H", body, 0)
                    with self._lock:
                        info = self._pending.pop(mid, None)
                    if info:
                        info._done()
                elif ptype == SUBACK:
                    self._suback.set()
                elif ptype == CONNACK:
                    self._connack.set()
                elif ptype == PINGRESP:
                    pass
        except (ConnectionError, OSError, ValueError):
            return
