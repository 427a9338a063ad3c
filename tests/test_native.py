"""Native C++ CSV scanner vs the python csv module."""

import csv
import io

import pytest

from databend_tpu import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_csv_scan_matches_python_csv(tmp_path):
    text = ('1,alpha,2.5\n'
            '2,"with,comma",3.5\n'
            '3,"quoted ""x""",\\N\n'
            '4,,0.0\r\n'
            '5,last,9\n')
    scanned = native.csv_scan(text.encode())
    assert scanned is not None
    starts, lens, quoted, row_ends = scanned
    data = text.encode()

    # reassemble via the same logic the formats layer uses
    rows = []
    begin = 0
    for end in row_ends:
        row = []
        for i in range(begin, end):
            cell = data[starts[i]:starts[i] + lens[i]].decode()
            if quoted[i]:
                cell = cell.strip()
                if cell.startswith('"') and cell.endswith('"'):
                    cell = cell[1:-1]
                cell = cell.replace('""', '"')
            row.append(cell)
        rows.append(row)
        begin = end

    expected = list(csv.reader(io.StringIO(text)))
    assert rows == expected


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_copy_uses_native_path(tmp_catalog, tmp_path, monkeypatch):
    from databend_tpu.formats import registry as fmt

    called = {"n": 0}
    orig = fmt._csv_rows_native

    def spy(path, opts):
        r = orig(path, opts)
        if r is not None:
            called["n"] += 1
        return r

    monkeypatch.setattr(fmt, "_csv_rows_native", spy)
    c = tmp_catalog
    c.sql("CREATE TABLE nv (id BIGINT, name VARCHAR)")
    src = tmp_path / "in.csv"
    src.write_text('1,"a,b"\n2,c\n')
    c.sql(f"COPY INTO nv FROM '{src}' FILE_FORMAT = (TYPE = CSV)")
    assert called["n"] == 1
    assert c.sql("SELECT name FROM nv WHERE id = 1").scalar() == "a,b"
