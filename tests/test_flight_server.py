"""Arrow Flight SQL endpoint tests."""

import pytest

fl = pytest.importorskip("pyarrow.flight")

from databend_tpu.service.flight import FlightSQLServer


@pytest.fixture
def server(tmp_path):
    srv = FlightSQLServer(data_root=str(tmp_path))
    yield srv
    srv.shutdown()


def test_flight_roundtrip(server):
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    client.do_action(fl.Action("execute", b"CREATE TABLE ft (id BIGINT, name VARCHAR)"))
    client.do_action(fl.Action("execute", b"INSERT INTO ft VALUES (1, 'a'), (2, 'b')"))
    info = client.get_flight_info(
        fl.FlightDescriptor.for_command(b"SELECT id, name FROM ft ORDER BY id"))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.num_rows == 2
    assert table.column("id").to_pylist() == [1, 2]
    assert table.column("name").to_pylist() == ["a", "b"]


def test_flight_vector_search_and_errors(server):
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    client.do_action(fl.Action("execute", b"CREATE TABLE fv (id INT, emb VECTOR(4))"))
    client.do_action(fl.Action("execute",
                               b"INSERT INTO fv VALUES (1, [1.0,0,0,0]), (2, [0,1.0,0,0])"))
    t = client.do_get(fl.Ticket(
        b"SELECT id FROM fv ORDER BY cosine_distance(emb, [1.0,0,0,0]) LIMIT 1")).read_all()
    assert t.column("id").to_pylist() == [1]
    with pytest.raises(fl.FlightServerError):
        client.do_get(fl.Ticket(b"SELECT * FROM nope")).read_all()
    res = list(client.do_action(fl.Action("health", b"")))
    assert res[0].body.to_pybytes() == b"ok"
