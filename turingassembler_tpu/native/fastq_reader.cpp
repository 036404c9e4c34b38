// Native FASTQ ingest — the framework's high-throughput data loader.
//
// Plays the role of the reference's producer-thread pipeline
// (src/fastq_producer.c + src/get_buffer.c): gzip-chunked FASTQ parsing
// and 2-bit base encoding off the Python hot path.  Exposed as a C ABI
// consumed via ctypes (io/native_loader.py); emits device-ready padded
// uint8 code matrices (A0 C1 G2 T3, 4=N, 255=pad) plus lengths, and the
// raw name/comment spans needed by the barcode sorter.
//
// Build: make -C turingassembler_tpu/native   (g++ -O3 -shared -lz)

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t CHUNK = 1 << 20;

int8_t NT4[256];
struct Nt4Init {
    Nt4Init() {
        memset(NT4, 4, sizeof(NT4));
        NT4[(int)'A'] = NT4[(int)'a'] = 0;
        NT4[(int)'C'] = NT4[(int)'c'] = 1;
        NT4[(int)'G'] = NT4[(int)'g'] = 2;
        NT4[(int)'T'] = NT4[(int)'t'] = 3;
    }
} nt4_init;

struct Reader {
    gzFile gz = nullptr;
    FILE *fp = nullptr;
    std::vector<char> buf;
    size_t pos = 0;      // parse cursor
    size_t len = 0;      // valid bytes
    bool eof = false;

    bool fill() {
        // compact and refill
        if (pos > 0) {
            memmove(buf.data(), buf.data() + pos, len - pos);
            len -= pos;
            pos = 0;
        }
        if (buf.size() - len < CHUNK) buf.resize(len + CHUNK);
        long n;
        if (gz)
            n = gzread(gz, buf.data() + len, CHUNK);
        else
            n = fread(buf.data() + len, 1, CHUNK, fp);
        if (n <= 0) {
            eof = true;
            return false;
        }
        len += (size_t)n;
        return true;
    }

    // next line [start, end) excluding newline; returns false at EOF
    bool next_line(size_t &start, size_t &end) {
        while (true) {
            char *nl = (char *)memchr(buf.data() + pos, '\n', len - pos);
            if (nl) {
                start = pos;
                end = (size_t)(nl - buf.data());
                pos = end + 1;
                return true;
            }
            if (eof) {
                if (pos < len) {  // last line without newline
                    start = pos;
                    end = len;
                    pos = len;
                    return true;
                }
                return false;
            }
            fill();
        }
    }
};

}  // namespace

extern "C" {

void *tafq_open(const char *path) {
    Reader *r = new Reader();
    size_t n = strlen(path);
    if (n > 3 && strcmp(path + n - 3, ".gz") == 0) {
        r->gz = gzopen(path, "rb");
        if (!r->gz) { delete r; return nullptr; }
        gzbuffer(r->gz, 1 << 20);
    } else {
        r->fp = fopen(path, "rb");
        if (!r->fp) { delete r; return nullptr; }
    }
    r->buf.resize(CHUNK * 2);
    return r;
}

void tafq_close(void *h) {
    Reader *r = (Reader *)h;
    if (!r) return;
    if (r->gz) gzclose(r->gz);
    if (r->fp) fclose(r->fp);
    delete r;
}

// Read up to max_reads records.
//   bases:   max_reads * pad_to uint8, pre-filled by callee (255 pad)
//   lengths: max_reads int32 (true length, possibly > pad_to; bases
//            truncated to pad_to)
//   headers: optional buffer receiving '@'-stripped header lines packed
//            back-to-back; header_off: max_reads+1 int64 offsets (pass
//            nullptr to skip)
// Returns number of records read; -1 on malformed input.
long tafq_next_batch(void *h, long max_reads, long pad_to,
                     uint8_t *bases, int32_t *lengths,
                     char *headers, long headers_cap, int64_t *header_off) {
    Reader *r = (Reader *)h;
    long nread = 0;
    long hpos = 0;
    if (header_off) header_off[0] = 0;
    memset(bases, 255, (size_t)max_reads * pad_to);
    while (nread < max_reads) {
        size_t s0, e0;
        if (!r->next_line(s0, e0)) break;
        if (e0 == s0) continue;  // blank line
        if (r->buf[s0] != '@') return -1;
        // NOTE: next_line() may memmove the buffer (fill), so each
        // line's bytes must be consumed before the next call
        if (headers && header_off) {
            long hl = (long)(e0 - s0) - 1;  // drop '@'
            if (hpos + hl > headers_cap) {
                headers = nullptr;
            } else {
                memcpy(headers + hpos, r->buf.data() + s0 + 1, hl);
                hpos += hl;
            }
        }
        size_t s1, e1, s2, e2, s3, e3;
        if (!r->next_line(s1, e1)) return -1;  // seq
        long sl = (long)(e1 - s1);
        long keep = sl < pad_to ? sl : pad_to;
        const char *seq = r->buf.data() + s1;
        uint8_t *dst = bases + (size_t)nread * pad_to;
        for (long i = 0; i < keep; ++i) dst[i] = (uint8_t)NT4[(int)(unsigned char)seq[i]];
        lengths[nread] = (int32_t)(sl < pad_to ? sl : pad_to);
        if (header_off) header_off[nread + 1] = hpos;
        if (!r->next_line(s2, e2)) return -1;  // +
        if (!r->next_line(s3, e3)) return -1;  // qual
        ++nread;
    }
    return nread;
}

}  // extern "C"
