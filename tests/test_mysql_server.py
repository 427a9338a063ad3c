"""MySQL wire protocol tests (raw-socket minimal client)."""

import socket
import struct

import pytest

from databend_tpu.service.mysql.server import MySQLServer


class MiniClient:
    """Just enough of the client side of protocol v10 for tests."""

    def __init__(self, port, user="root", database=None):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        self.seq = 0
        self._handshake(user, database)

    def _read_n(self, n):
        buf = b""
        while len(buf) < n:
            c = self.sock.recv(n - len(buf))
            if not c:
                raise ConnectionError
            buf += c
        return buf

    def read_packet(self):
        hdr = self._read_n(4)
        ln = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16)
        self.seq = (hdr[3] + 1) & 0xFF
        return self._read_n(ln)

    def send_packet(self, payload):
        ln = len(payload)
        self.sock.sendall(bytes([ln & 0xFF, (ln >> 8) & 0xFF,
                                 (ln >> 16) & 0xFF, self.seq]) + payload)
        self.seq = (self.seq + 1) & 0xFF

    def _handshake(self, user, database):
        greeting = self.read_packet()
        assert greeting[0] == 0x0A
        caps = 0x200 | 0x8000 | 0x1  # PROTOCOL_41 | SECURE_CONNECTION
        if database:
            caps |= 0x8
        p = struct.pack("<IIB23x", caps, 1 << 24, 0x21)
        p += user.encode() + b"\x00"
        p += bytes([0])  # empty auth
        if database:
            p += database.encode() + b"\x00"
        self.send_packet(p)
        ok = self.read_packet()
        assert ok[0] == 0x00, ok

    def _lenenc(self, data, i):
        b0 = data[i]
        if b0 < 0xFB:
            return b0, i + 1
        if b0 == 0xFC:
            return struct.unpack("<H", data[i+1:i+3])[0], i + 3
        if b0 == 0xFD:
            return struct.unpack("<I", data[i+1:i+4] + b"\x00")[0], i + 4
        return struct.unpack("<Q", data[i+1:i+9])[0], i + 9

    def query(self, sql):
        self.seq = 0
        self.send_packet(b"\x03" + sql.encode())
        first = self.read_packet()
        if first[0] == 0x00:
            return "OK", []
        if first[0] == 0xFF:
            code = struct.unpack("<H", first[1:3])[0]
            raise RuntimeError(f"ERR {code}: {first[9:].decode()}")
        ncols, _ = self._lenenc(first, 0)
        for _ in range(ncols):
            self.read_packet()  # column defs
        eof = self.read_packet()
        assert eof[0] == 0xFE
        rows = []
        while True:
            pkt = self.read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:
                break
            row, i = [], 0
            for _ in range(ncols):
                if pkt[i] == 0xFB:
                    row.append(None)
                    i += 1
                else:
                    ln, i = self._lenenc(pkt, i)
                    row.append(pkt[i:i+ln].decode())
                    i += ln
            rows.append(row)
        return "ROWS", rows

    def close(self):
        try:
            self.seq = 0
            self.send_packet(b"\x01")
        finally:
            self.sock.close()


@pytest.fixture
def server(tmp_path):
    srv = MySQLServer(data_root=str(tmp_path), port=0)
    srv.start()
    yield srv
    srv.stop()


def test_mysql_query_roundtrip(server):
    c = MiniClient(server.port)
    kind, rows = c.query("SELECT 1 + 2 AS x")
    assert rows == [["3"]]
    kind, _ = c.query("CREATE TABLE m (id INT, name VARCHAR)")
    assert kind in ("OK", "ROWS")
    c.query("INSERT INTO m VALUES (1, 'a'), (2, NULL)")
    kind, rows = c.query("SELECT id, name FROM m ORDER BY id")
    assert rows == [["1", "a"], ["2", None]]
    with pytest.raises(RuntimeError):
        c.query("SELECT * FROM missing")
    # session boilerplate is tolerated
    assert c.query("SET NAMES utf8mb4")[0] == "OK"
    c.close()


def test_mysql_vector_search_over_wire(server):
    c = MiniClient(server.port)
    c.query("CREATE TABLE mv (id INT, emb VECTOR(4))")
    c.query("INSERT INTO mv VALUES (1, [1.0,0,0,0]), (2, [0,1.0,0,0])")
    _, rows = c.query(
        "SELECT id FROM mv ORDER BY cosine_distance(emb, [1.0,0,0,0]) LIMIT 1")
    assert rows == [["1"]]
    c.close()


def test_mysql_unknown_user(server):
    with pytest.raises(AssertionError):
        MiniClient(server.port, user="ghost")
