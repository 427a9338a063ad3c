"""Dictionary MYSQL/REDIS sources over live sockets.

Reference: dictionary sources in interpreter_dictionary_*.rs (sqlx MySQL
+ redis connectors). No network egress here, so the MYSQL source is
exercised against this engine's OWN MySQL wire front end on localhost,
and the REDIS source against a minimal in-process RESP server — the full
client protocol paths run either way.
"""

import socketserver
import threading

import pytest


@pytest.fixture()
def ctx(tmp_path):
    from databend_tpu import SessionContext
    return SessionContext(data_root=str(tmp_path / "engine"))


def test_mysql_client_roundtrip(tmp_path):
    from databend_tpu.service.mysql.client import MySQLClient
    from databend_tpu.service.mysql.server import MySQLServer
    srv = MySQLServer(data_root=str(tmp_path / "src"), port=0)
    port = srv.start()
    try:
        cli = MySQLClient("127.0.0.1", port, "root", "")
        cli.query("CREATE TABLE t (k INT, v VARCHAR)")
        cli.query("INSERT INTO t VALUES (1, 'one'), (2, NULL)")
        cols, rows = cli.query("SELECT k, v FROM t ORDER BY k")
        assert cols == ["k", "v"]
        assert rows == [["1", "one"], ["2", None]]
        cli.close()
    finally:
        srv.stop()


def test_dictionary_mysql_source(tmp_path, ctx):
    from databend_tpu.service.mysql.server import MySQLServer
    srv = MySQLServer(data_root=str(tmp_path / "src"), port=0)
    port = srv.start()
    try:
        srv.ctx.sql("CREATE TABLE cities (id INT, cname VARCHAR)")
        srv.ctx.sql("INSERT INTO cities VALUES (1,'berlin'), (2,'paris')")
        ctx.sql(f"CREATE DICTIONARY cd (id INT, cname VARCHAR)"
                f" PRIMARY KEY id SOURCE(MYSQL(host='127.0.0.1',"
                f" port='{port}', username='root', password='',"
                f" db='default', table='cities'))")
        ctx.sql("CREATE TABLE o (x INT)")
        ctx.sql("INSERT INTO o VALUES (1), (2), (3)")
        rows = ctx.sql("SELECT x, dict_get(cd, 'cname', x) FROM o"
                       " ORDER BY x").rows()
        assert rows == [(1, "berlin"), (2, "paris"), (3, None)]
    finally:
        srv.stop()


class _FakeRedis(socketserver.ThreadingTCPServer):
    """Minimal RESP server: SCAN (single pass) + MGET + GET."""
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, data):
        self.data = data
        super().__init__(("127.0.0.1", 0), _FakeRedisHandler)


class _FakeRedisHandler(socketserver.StreamRequestHandler):
    def handle(self):
        while True:
            line = self.rfile.readline()
            if not line:
                return
            assert line[:1] == b"*"
            nargs = int(line[1:].strip())
            args = []
            for _ in range(nargs):
                ln = self.rfile.readline()
                assert ln[:1] == b"$"
                n = int(ln[1:].strip())
                args.append(self.rfile.read(n + 2)[:n].decode())
            cmd = args[0].upper()
            data = self.server.data
            if cmd == "SCAN":
                keys = sorted(data)
                out = b"*2\r\n$1\r\n0\r\n"
                out += f"*{len(keys)}\r\n".encode()
                for k in keys:
                    out += f"${len(k)}\r\n{k}\r\n".encode()
            elif cmd == "MGET":
                out = f"*{len(args) - 1}\r\n".encode()
                for k in args[1:]:
                    v = data.get(k)
                    out += (b"$-1\r\n" if v is None
                            else f"${len(v)}\r\n{v}\r\n".encode())
            elif cmd == "GET":
                v = data.get(args[1])
                out = (b"$-1\r\n" if v is None
                       else f"${len(v)}\r\n{v}\r\n".encode())
            else:
                out = b"-ERR unknown command\r\n"
            self.wfile.write(out)
            self.wfile.flush()


def test_dictionary_redis_source(ctx):
    srv = _FakeRedis({"de": "Germany", "fr": "France"})
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ctx.sql(f"CREATE DICTIONARY rd (k VARCHAR, v VARCHAR)"
                f" PRIMARY KEY k SOURCE(REDIS(host='127.0.0.1',"
                f" port='{port}'))")
        rows = ctx.sql("SELECT dict_get(rd, 'v', 'de'),"
                       " dict_get(rd, 'v', 'xx')").rows()
        assert rows == [("Germany", None)]
    finally:
        srv.shutdown()
        srv.server_close()
