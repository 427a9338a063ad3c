"""Layered config: defaults < toml file < env < CLI."""

import pytest

from databend_tpu.config import Config
from databend_tpu.errors import DatabendError


def test_defaults():
    cfg = Config.load(env={})
    assert cfg.query.http_handler_port == 8124
    assert cfg.storage.type == "fs"


def test_file_env_cli_layering(tmp_path):
    f = tmp_path / "cfg.toml"
    f.write_text("""
[query]
max_threads = 2
http_handler_port = 9000

[storage]
data_path = "/data/a"
""")
    cfg = Config.load(
        config_file=str(f),
        env={"DATABEND_TPU_QUERY__HTTP_HANDLER_PORT": "9100",
             "DATABEND_TPU_LOG__LEVEL": "DEBUG",
             "UNRELATED": "x"},
        argv=["--query-http-handler-port=9200", "--storage-data-path", "/data/b"])
    assert cfg.query.max_threads == 2                 # file
    assert cfg.query.http_handler_port == 9200        # cli wins over env/file
    assert cfg.log.level == "DEBUG"                   # env
    assert cfg.storage.data_path == "/data/b"         # cli


def test_bool_and_list_coercion():
    cfg = Config.load(env={"DATABEND_TPU_META__EMBEDDED": "false",
                           "DATABEND_TPU_META__ENDPOINTS": "a:1,b:2"})
    assert cfg.meta.embedded is False
    assert cfg.meta.endpoints == ["a:1", "b:2"]


def test_obsolete_and_unknown_keys(tmp_path):
    f = tmp_path / "cfg.toml"
    f.write_text("[query]\ntable_cache_enabled = true\n")
    Config.load(config_file=str(f), env={})  # obsolete: silently dropped
    f.write_text("[query]\nno_such_key = 1\n")
    with pytest.raises(DatabendError):
        Config.load(config_file=str(f), env={})
