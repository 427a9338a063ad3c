"""Unified binary entrypoint + meta cli-config layering.

Reference: src/binaries (databend-query/meta/metactl mains),
src/meta/cli-config (layered meta config).
"""

import subprocess
import sys

import pytest

from databend_tpu.errors import BadArguments
from databend_tpu.meta.cli_config import MetaServerConfig


def test_meta_config_defaults():
    cfg = MetaServerConfig.load([], env={})
    assert cfg.port == 9191 and cfg.raft_id is None and cfg.path is None


def test_meta_config_layering(tmp_path):
    f = tmp_path / "meta.toml"
    f.write_text('port = 7000\nhost = "0.0.0.0"\nlog_level = "DEBUG"\n')
    # file < env < CLI
    cfg = MetaServerConfig.load(
        ["--config-file", str(f), "--port", "7002"],
        env={"DATABEND_TPU_META_PORT": "7001",
             "DATABEND_TPU_META_HEARTBEAT_INTERVAL": "0.5"})
    assert cfg.port == 7002           # CLI wins
    assert cfg.host == "0.0.0.0"      # from file
    assert cfg.heartbeat_interval == 0.5  # from env
    assert cfg.log_level == "DEBUG"


def test_meta_config_raft_peers_and_sections(tmp_path):
    f = tmp_path / "meta.toml"
    f.write_text('[raft]\nraft_id = "n1"\n'
                 '[peers]\nraft_peers = "n1=127.0.0.1:1,n2=127.0.0.1:2"\n')
    cfg = MetaServerConfig.load(["--config-file=" + str(f)], env={})
    assert cfg.raft_id == "n1"
    assert cfg.raft_peers == {"n1": "127.0.0.1:1", "n2": "127.0.0.1:2"}


def test_meta_config_rejects_unknown_key():
    with pytest.raises(BadArguments):
        MetaServerConfig.load(["--no-such-key", "1"], env={})


def test_unified_entry_help_and_version():
    from databend_tpu.__main__ import main
    assert main(["help"]) == 0
    assert main(["version"]) == 0
    assert main(["definitely-not-a-command"]) == 2


def test_unified_entry_metactl(tmp_path):
    from databend_tpu.meta.kv import MetaStore
    db = tmp_path / "m.db"
    store = MetaStore(str(db))
    store.upsert("tables/1", {"name": "t"})
    store.close()
    r = subprocess.run(
        [sys.executable, "-m", "databend_tpu", "metactl", "export",
         "--meta-path", str(db)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "tables/1" in r.stdout


def test_unified_entry_subprocess_version():
    r = subprocess.run([sys.executable, "-m", "databend_tpu", "version"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "databend_tpu v" in r.stdout
