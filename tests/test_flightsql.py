"""FlightSQL protocol tests (VERDICT r3 item 10).

A pyarrow Flight client drives the server with the SAME Any-wrapped
protobuf commands ADBC/JDBC drivers send (`CommandStatementQuery`,
`CommandGetTables`, prepared statements with DoPut parameter binding).
The wire bytes come from our hand codec (service/flight/flightsql.py);
the test cross-checks them against google.protobuf's Any parser so the
encoding provably matches protoc output.
"""

import numpy as np
import pyarrow as pa
import pyarrow.flight as fl
import pytest

from databend_tpu.service.flight import flightsql as fsql
from databend_tpu.service.flight.server import FlightSQLServer


@pytest.fixture
def server(tmp_path):
    srv = FlightSQLServer(data_root=str(tmp_path))
    yield srv, fl.connect(f"grpc://127.0.0.1:{srv.port}")
    srv.shutdown()


def _fetch(client, cmd_bytes) -> pa.Table:
    info = client.get_flight_info(fl.FlightDescriptor.for_command(cmd_bytes))
    return client.do_get(info.endpoints[0].ticket).read_all()


def test_codec_matches_protobuf_any():
    """Our hand-rolled wire bytes parse as a well-formed protobuf Any."""
    from google.protobuf.any_pb2 import Any
    raw = fsql.cmd_statement_query("SELECT 1")
    a = Any()
    a.ParseFromString(raw)
    assert a.type_url == ("type.googleapis.com/"
                          "arrow.flight.protocol.sql.CommandStatementQuery")
    assert fsql.parse_statement_query(a.value) == "SELECT 1"
    # round-trips of the other messages
    t, p = fsql.unpack_any(fsql.cmd_get_tables(
        db_schema_filter_pattern="def%", table_name_filter_pattern="t_",
        include_schema=True))
    assert t == "CommandGetTables"
    req = fsql.parse_get_tables(p)
    assert req["db_schema_filter_pattern"] == "def%"
    assert req["include_schema"] is True


def test_statement_query_roundtrip(server):
    srv, client = server
    srv.ctx.sql("CREATE TABLE ft (a INT, b VARCHAR)")
    srv.ctx.sql("INSERT INTO ft VALUES (1, 'x'), (2, 'y')")
    table = _fetch(client, fsql.cmd_statement_query(
        "SELECT a, b FROM ft ORDER BY a"))
    assert table.column("a").to_pylist() == [1, 2]
    assert table.column("b").to_pylist() == ["x", "y"]
    # a ticket is single-use
    info = client.get_flight_info(fl.FlightDescriptor.for_command(
        fsql.cmd_statement_query("SELECT 41 + 1")))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.to_pydict()[t.schema.names[0]] == [42]
    with pytest.raises(fl.FlightServerError):
        client.do_get(info.endpoints[0].ticket).read_all()


def test_catalog_metadata_commands(server):
    srv, client = server
    srv.ctx.sql("CREATE DATABASE meta_db")
    srv.ctx.sql("CREATE TABLE meta_db.mt (x INT)")
    cats = _fetch(client, fsql.cmd_get_catalogs())
    assert cats.column("catalog_name").to_pylist() == ["default"]
    schemas = _fetch(client, fsql.cmd_get_db_schemas())
    assert "meta_db" in schemas.column("db_schema_name").to_pylist()
    tables = _fetch(client, fsql.cmd_get_tables(
        db_schema_filter_pattern="meta%", include_schema=True))
    assert tables.column("table_name").to_pylist() == ["mt"]
    assert tables.column("table_type").to_pylist() == ["TABLE"]
    blob = tables.column("table_schema").to_pylist()[0]
    schema = pa.ipc.read_schema(pa.py_buffer(blob))
    assert schema.names == ["x"]


def test_prepared_statement_with_params(server):
    srv, client = server
    srv.ctx.sql("CREATE TABLE pf (a INT)")
    srv.ctx.sql("INSERT INTO pf VALUES (1), (5), (9)")
    results = list(client.do_action(fl.Action(
        "CreatePreparedStatement",
        fsql.action_create_prepared_request(
            "SELECT count(*) FROM pf WHERE a > ?"))))
    handle, _, _ = fsql.parse_create_prepared_result(
        fsql.unpack_any(results[0].body.to_pybytes())[1])
    assert handle
    # bind one parameter row via DoPut, then fetch
    desc = fl.FlightDescriptor.for_command(
        fsql.cmd_prepared_statement_query(handle))
    writer, _ = client.do_put(desc, pa.schema([("p0", pa.int64())]))
    writer.write_table(pa.table({"p0": pa.array([4], pa.int64())}))
    writer.close()
    table = _fetch(client, fsql.cmd_prepared_statement_query(handle))
    assert table.columns[0].to_pylist() == [2]
    # close, then the handle is gone
    list(client.do_action(fl.Action(
        "ClosePreparedStatement",
        fsql.action_close_prepared_request(handle))))
    with pytest.raises(fl.FlightServerError):
        _fetch(client, fsql.cmd_prepared_statement_query(handle))


def test_statement_update_via_do_put(server):
    srv, client = server
    srv.ctx.sql("CREATE TABLE up (a INT)")
    desc = fl.FlightDescriptor.for_command(fsql.cmd_statement_update(
        "INSERT INTO up VALUES (7), (8)"))
    writer, reader = client.do_put(desc, pa.schema([]))
    writer.done_writing()
    buf = reader.read()
    assert fsql.parse_do_put_update_result(buf.to_pybytes()) == 2
    writer.close()
    assert srv.ctx.sql("SELECT count(*) FROM up").rows() == [(2,)]


def test_legacy_raw_sql_still_works(server):
    srv, client = server
    info = client.get_flight_info(
        fl.FlightDescriptor.for_command(b"SELECT 1 + 1"))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.to_pydict()[table.schema.names[0]] == [2]
