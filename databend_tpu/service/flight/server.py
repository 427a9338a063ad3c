"""Arrow Flight SQL server.

Reference analog: the FlightSQL handler (src/binaries/query/entry.rs:233)
and Arrow Flight v1 exchange serialization (servers/flight/v1/exchange/
serde/exchange_serializer.rs:19-26) — queries in, Arrow record batches
out. Protocol: the flight descriptor command / ticket IS the SQL text
(UTF-8); results stream back as Arrow IPC batches. Works with any Arrow
Flight client:

    import pyarrow.flight as fl
    c = fl.connect("grpc://127.0.0.1:8900")
    info = c.get_flight_info(fl.FlightDescriptor.for_command(b"SELECT 1"))
    table = c.do_get(info.endpoints[0].ticket).read_all()
"""

from __future__ import annotations

import threading
from typing import Optional

import pyarrow as pa
import pyarrow.flight as fl

from ...errors import DatabendError
from ..session import SessionContext


class FlightSQLServer(fl.FlightServerBase):
    def __init__(self, data_root: str = ".databend_tpu",
                 location: str = "grpc://127.0.0.1:0",
                 max_running_queries: int = 0):
        super().__init__(location)
        self.ctx = SessionContext(data_root=data_root)
        # admission control instead of a global query lock: reads run
        # concurrently on per-request session views (identity/db isolated);
        # commits serialize via snapshot OCC (reference QueriesQueueManager)
        from ...utils.memstat import QueryQueue
        if not max_running_queries:
            try:
                max_running_queries = int(
                    self.ctx.settings.get("max_running_queries") or 0)
            except Exception:
                max_running_queries = 0
        self._queue = QueryQueue(max_running_queries)

    def _run(self, sql: str) -> pa.Table:
        from ...storage.fuse.block_io import block_to_arrow
        self._queue.acquire()
        try:
            session = self.ctx.for_user(self.ctx.current_user)
            res = session.sql(sql)
        except DatabendError as e:
            raise fl.FlightServerError(str(e))
        finally:
            self._queue.release()
        return block_to_arrow(res.block)

    # -------------------------------------------------------------- flight
    def get_flight_info(self, context, descriptor):
        sql = (descriptor.command or b"").decode("utf-8")
        table = self._run(sql)
        ticket = fl.Ticket(sql.encode("utf-8"))
        endpoint = fl.FlightEndpoint(ticket, [])
        return fl.FlightInfo(table.schema, descriptor, [endpoint],
                             table.num_rows, -1)

    def do_get(self, context, ticket):
        sql = ticket.ticket.decode("utf-8")
        table = self._run(sql)
        return fl.RecordBatchStream(table)

    def do_action(self, context, action):
        if action.type == "execute":
            table = self._run(action.body.to_pybytes().decode("utf-8"))
            return iter([fl.Result(str(table.num_rows).encode())])
        if action.type == "health":
            return iter([fl.Result(b"ok")])
        raise fl.FlightServerError(f"unknown action {action.type!r}")


def main():  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser(description="databend_tpu Flight SQL server")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--data-root", default=".databend_tpu")
    a = p.parse_args()
    srv = FlightSQLServer(a.data_root, f"grpc://127.0.0.1:{a.port}")
    print(f"flight sql listening on grpc://127.0.0.1:{srv.port}")
    srv.serve()


if __name__ == "__main__":  # pragma: no cover
    main()
