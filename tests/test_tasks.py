"""Scheduled tasks (CREATE TASK)."""

import time

import pytest

from databend_tpu.errors import DatabendError


def test_task_lifecycle(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE tt (v BIGINT)")
    c.sql("CREATE TASK t1 SCHEDULE = 60 SECOND AS INSERT INTO tt VALUES (1)")
    rows = c.sql("SHOW TASKS").rows()
    assert rows[0][0] == "t1" and rows[0][1] == "SUSPENDED"
    with pytest.raises(DatabendError):
        c.sql("CREATE TASK t1 SCHEDULE = 10 SECOND AS SELECT 1")
    c.sql("EXECUTE TASK t1")
    assert c.sql("SELECT count(*) FROM tt").scalar() == 1
    c.sql("ALTER TASK t1 RESUME")
    assert c.sql("SHOW TASKS").rows()[0][1] == "STARTED"
    c.tasks.stop_scheduler()
    c.sql("ALTER TASK t1 SUSPEND")
    c.sql("DROP TASK t1")
    with pytest.raises(DatabendError):
        c.sql("DROP TASK t1")
    c.sql("DROP TASK IF EXISTS t1")


def test_task_scheduler_fires_due(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ts (v BIGINT)")
    c.sql("CREATE TASK tick SCHEDULE = 1 SECOND AS INSERT INTO ts VALUES (1)")
    c.tasks.set_state("tick", "STARTED")
    # drive the scheduler loop synchronously (deterministic in tests)
    fired = c.tasks.run_due()
    assert fired == 1
    assert c.sql("SELECT count(*) FROM ts").scalar() == 1
    # not due again immediately
    assert c.tasks.run_due() == 0
    c.sql("DROP TASK tick")


def test_task_failure_recorded(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TASK bad SCHEDULE = 60 SECOND AS SELECT * FROM missing_t")
    with pytest.raises(DatabendError):
        c.sql("EXECUTE TASK bad")
    assert c.tasks.history[-1]["error"] is not None
