// Native CSV scanner for the COPY ingest path.
//
// TPU-native counterpart of the reference's native data-path code: the
// reference keeps its hot loaders in Rust (src/query/formats field
// decoders) and its hot scorers in C (src/query/storages/common/index/
// cpp/*.c). On this engine the scorers became MXU/Pallas programs; the
// host-side ingest tokenizer is the piece that stays scalar and
// branch-heavy, so it lives here as C++ loaded via ctypes.
//
// One pass over the buffer, RFC-4180 quoting (quote doubling), records
// field start/length pairs plus a per-field "was quoted" flag so the
// Python layer can slice columns out of the raw bytes without re-parsing.

#include <cstdint>
#include <cstddef>

extern "C" {

// Count rows and fields so the caller can size the output arrays.
// Returns 0 on success.
int dbtpu_csv_count(const char* buf, int64_t len, char delim, char quote,
                    int64_t* out_rows, int64_t* out_fields) {
    int64_t rows = 0, fields = 0;
    bool in_quotes = false;
    bool row_open = false;
    for (int64_t i = 0; i < len; ++i) {
        char c = buf[i];
        if (in_quotes) {
            if (c == quote) {
                if (i + 1 < len && buf[i + 1] == quote) { ++i; }
                else { in_quotes = false; }
            }
            continue;
        }
        if (c == quote) { in_quotes = true; row_open = true; }
        else if (c == delim) { ++fields; row_open = true; }
        else if (c == '\n') {
            if (row_open || i == 0 || buf[i - 1] != '\n') { ++fields; ++rows; }
            row_open = false;
        }
        else if (c != '\r') { row_open = true; }
    }
    if (row_open) { ++fields; ++rows; }
    *out_rows = rows;
    *out_fields = fields;
    return 0;
}

// Fill start/len/quoted arrays (sized by dbtpu_csv_count) and the row
// boundary array row_ends (exclusive field index per row).
int dbtpu_csv_scan(const char* buf, int64_t len, char delim, char quote,
                   int64_t* starts, int64_t* lens, uint8_t* quoted,
                   int64_t* row_ends) {
    int64_t fi = 0, ri = 0;
    int64_t field_start = 0;
    bool in_quotes = false;
    bool was_quoted = false;
    bool row_open = false;

    auto close_field = [&](int64_t end) {
        starts[fi] = field_start;
        lens[fi] = end - field_start;
        quoted[fi] = was_quoted ? 1 : 0;
        ++fi;
        was_quoted = false;
    };

    for (int64_t i = 0; i < len; ++i) {
        char c = buf[i];
        if (in_quotes) {
            if (c == quote) {
                if (i + 1 < len && buf[i + 1] == quote) { ++i; }
                else { in_quotes = false; }
            }
            continue;
        }
        if (c == quote) { in_quotes = true; was_quoted = true; row_open = true; }
        else if (c == delim) { close_field(i); field_start = i + 1; row_open = true; }
        else if (c == '\n') {
            int64_t end = (i > 0 && buf[i - 1] == '\r') ? i - 1 : i;
            if (row_open || i == 0 || buf[i - 1] != '\n') {
                close_field(end);
                row_ends[ri++] = fi;
            }
            field_start = i + 1;
            row_open = false;
        }
        else if (c != '\r') { row_open = true; }
    }
    if (row_open) { close_field(len); row_ends[ri++] = fi; }
    return 0;
}

}  // extern "C"
