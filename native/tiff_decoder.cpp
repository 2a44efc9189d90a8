// Native TIFF decode path for the training input pipeline.
//
// The reference decodes GeoTIFF stacks per item in python (tifffile) inside
// its DataLoader (reference models/data.py:64-68) — the dominant host-side
// cost.  This library decodes batches of baseline TIFFs (uncompressed or
// zlib/deflate strips, uint8/uint16/float32, contiguous planar) directly
// into a caller-provided float32 HWC buffer on a std::thread pool, with no
// python object churn; python binds via ctypes (no pybind11 in the image).
//
// The hot path (little-endian float32, uncompressed) seeks straight to the
// strips and freads them into the destination buffer — one data pass, no
// intermediate copies.  Wire-format coverage matches
// floodgan_tpu/data/tiff.py (the pure-python twin used as fallback and
// golden reference in tests).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

constexpr int kTypeSizes[13] = {0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8};

struct TiffInfo {
    uint32_t width = 0, height = 0;
    uint16_t spp = 1, bits = 8, compression = 1, sample_format = 1;
    uint16_t predictor = 1, planar = 1;
    bool big_endian = false;
    std::vector<uint64_t> strip_offsets, strip_counts;
};

uint16_t rd16(const uint8_t* p, bool be) {
    return be ? (uint16_t)((p[0] << 8) | p[1]) : (uint16_t)(p[0] | (p[1] << 8));
}
uint32_t rd32(const uint8_t* p, bool be) {
    return be ? ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                    ((uint32_t)p[2] << 8) | p[3]
              : (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
                    ((uint32_t)p[3] << 24);
}

bool read_at(FILE* f, long off, void* dst, size_t len) {
    if (std::fseek(f, off, SEEK_SET) != 0) return false;
    return std::fread(dst, 1, len, f) == len;
}

// Parse the first IFD with targeted reads (header, IFD block, external
// value arrays) — no whole-file read.
bool parse_header(FILE* f, TiffInfo* info) {
    uint8_t hdr[8];
    if (!read_at(f, 0, hdr, 8)) return false;
    bool be;
    if (hdr[0] == 'I' && hdr[1] == 'I') be = false;
    else if (hdr[0] == 'M' && hdr[1] == 'M') be = true;
    else return false;
    if (rd16(hdr + 2, be) != 42) return false;
    info->big_endian = be;
    uint32_t ifd_off = rd32(hdr + 4, be);

    uint8_t nbuf[2];
    if (!read_at(f, (long)ifd_off, nbuf, 2)) return false;
    uint16_t n = rd16(nbuf, be);
    std::vector<uint8_t> entries((size_t)n * 12);
    if (std::fread(entries.data(), 1, entries.size(), f) != entries.size())
        return false;

    auto values = [&](const uint8_t* e, std::vector<uint64_t>* out_vals) -> bool {
        uint16_t type = rd16(e + 2, be);
        uint32_t count = rd32(e + 4, be);
        if (type > 12) return true;  // skip unknown
        size_t vsize = (size_t)kTypeSizes[type] * count;
        std::vector<uint8_t> ext;
        const uint8_t* src = e + 8;
        if (vsize > 4) {
            ext.resize(vsize);
            if (!read_at(f, (long)rd32(e + 8, be), ext.data(), vsize)) return false;
            src = ext.data();
        }
        out_vals->clear();
        for (uint32_t k = 0; k < count; ++k) {
            const uint8_t* p = src + (size_t)kTypeSizes[type] * k;
            if (type == 3) out_vals->push_back(rd16(p, be));
            else if (type == 4) out_vals->push_back(rd32(p, be));
            else if (type == 1) out_vals->push_back(*p);
            else return true;  // other types unused by our tags
        }
        return true;
    };

    std::vector<uint64_t> vals;
    for (uint16_t i = 0; i < n; ++i) {
        const uint8_t* e = entries.data() + (size_t)i * 12;
        uint16_t tag = rd16(e, be);
        switch (tag) {
            case 256: if (!values(e, &vals) || vals.empty()) return false; info->width = (uint32_t)vals[0]; break;
            case 257: if (!values(e, &vals) || vals.empty()) return false; info->height = (uint32_t)vals[0]; break;
            case 258: if (!values(e, &vals) || vals.empty()) return false; info->bits = (uint16_t)vals[0]; break;
            case 259: if (!values(e, &vals) || vals.empty()) return false; info->compression = (uint16_t)vals[0]; break;
            case 273: if (!values(e, &vals)) return false; info->strip_offsets = vals; break;
            case 277: if (!values(e, &vals) || vals.empty()) return false; info->spp = (uint16_t)vals[0]; break;
            case 279: if (!values(e, &vals)) return false; info->strip_counts = vals; break;
            case 284: if (!values(e, &vals) || vals.empty()) return false; info->planar = (uint16_t)vals[0]; break;
            case 317: if (!values(e, &vals) || vals.empty()) return false; info->predictor = (uint16_t)vals[0]; break;
            case 339: if (!values(e, &vals) || vals.empty()) return false; info->sample_format = (uint16_t)vals[0]; break;
            default: break;
        }
    }
    return info->width && info->height && !info->strip_offsets.empty() &&
           info->strip_offsets.size() == info->strip_counts.size();
}

bool inflate_into(const uint8_t* src, size_t src_len, uint8_t* dst,
                  size_t dst_cap, size_t* written) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return false;
    zs.next_in = const_cast<Bytef*>(src);
    zs.avail_in = (uInt)src_len;
    zs.next_out = dst;
    zs.avail_out = (uInt)dst_cap;
    int rc = inflate(&zs, Z_FINISH);
    *written = dst_cap - zs.avail_out;
    inflateEnd(&zs);
    return rc == Z_STREAM_END || rc == Z_OK;
}

uint32_t bswap32(uint32_t v) {
    return (v >> 24) | ((v >> 8) & 0xff00u) | ((v << 8) & 0xff0000u) | (v << 24);
}

int decode_one(const std::string& path, float* out, int64_t out_h, int64_t out_w,
               int64_t out_c) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return -1;
    TiffInfo info;
    if (!parse_header(f, &info)) { std::fclose(f); return -3; }
    if ((int64_t)info.height != out_h || (int64_t)info.width != out_w ||
        (int64_t)info.spp != out_c) { std::fclose(f); return -5; }
    // Predictor (317) and separate planes (284) are not implemented here;
    // returning an error routes the file to the python twin (which handles
    // predictor 2 and rejects planar != 1 loudly) instead of silently
    // decoding differenced/interleaved bytes as pixels.
    if (info.predictor != 1 || info.planar != 1) { std::fclose(f); return -9; }

    size_t bps = info.bits / 8;
    size_t total = (size_t)info.height * info.width * info.spp * bps;
    size_t n = (size_t)info.height * info.width * info.spp;

    // Hot path: LE float32, uncompressed -> fread strips straight into out.
    if (info.compression == 1 && info.sample_format == 3 && info.bits == 32 &&
        !info.big_endian) {
        uint8_t* dst = reinterpret_cast<uint8_t*>(out);
        size_t pos = 0;
        for (size_t s = 0; s < info.strip_offsets.size(); ++s) {
            size_t cnt = info.strip_counts[s];
            if (pos + cnt > total) { std::fclose(f); return -6; }
            if (!read_at(f, (long)info.strip_offsets[s], dst + pos, cnt)) {
                std::fclose(f); return -6;
            }
            pos += cnt;
        }
        std::fclose(f);
        return pos == total ? 0 : -6;
    }

    // General path: gather strip payloads (decompressing as needed).  When
    // the payload is already LE float32 the destination buffer itself is
    // the gather target (no intermediate, no conversion pass).
    bool direct = info.sample_format == 3 && info.bits == 32 && !info.big_endian;
    std::vector<uint8_t> raw;
    if (!direct) raw.resize(total);
    uint8_t* gather = direct ? reinterpret_cast<uint8_t*>(out) : raw.data();
    std::vector<uint8_t> strip;
    size_t pos = 0;
    for (size_t s = 0; s < info.strip_offsets.size(); ++s) {
        size_t cnt = info.strip_counts[s];
        if (info.compression == 1) {
            if (pos + cnt > total) { std::fclose(f); return -6; }
            if (!read_at(f, (long)info.strip_offsets[s], gather + pos, cnt)) {
                std::fclose(f); return -6;
            }
            pos += cnt;
        } else if (info.compression == 8 || info.compression == 32946) {
            strip.resize(cnt);
            if (!read_at(f, (long)info.strip_offsets[s], strip.data(), cnt)) {
                std::fclose(f); return -6;
            }
            size_t written = 0;
            if (!inflate_into(strip.data(), cnt, gather + pos, total - pos,
                              &written)) { std::fclose(f); return -7; }
            pos += written;
        } else {
            std::fclose(f);
            return -8;  // unsupported compression -> python fallback
        }
    }
    std::fclose(f);

    if (direct) return 0;
    if (info.sample_format == 3 && info.bits == 32) {
        if (!info.big_endian) {
            std::memcpy(out, raw.data(), n * 4);
        } else {
            const uint32_t* p = reinterpret_cast<const uint32_t*>(raw.data());
            uint32_t* o = reinterpret_cast<uint32_t*>(out);
            for (size_t i = 0; i < n; ++i) o[i] = bswap32(p[i]);
        }
    } else if (info.sample_format != 3 && info.bits == 8) {
        const uint8_t* p = raw.data();
        for (size_t i = 0; i < n; ++i) out[i] = (float)p[i];
    } else if (info.sample_format != 3 && info.bits == 16) {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(raw.data());
        if (!info.big_endian) {
            for (size_t i = 0; i < n; ++i) out[i] = (float)p[i];
        } else {
            for (size_t i = 0; i < n; ++i)
                out[i] = (float)(uint16_t)((p[i] >> 8) | (p[i] << 8));
        }
    } else {
        return -9;
    }
    return 0;
}

}  // namespace

extern "C" {

// Decode ``count`` TIFF files concurrently into ``out`` (count, h, w, c)
// float32.  ``paths`` is a NUL-separated concatenation.  Returns 0 on
// success; the (negative) first error code otherwise.
int floodgan_decode_batch(const char* paths, int64_t count, float* out, int64_t h,
                          int64_t w, int64_t c, int64_t num_threads) {
    std::vector<std::string> files;
    const char* p = paths;
    for (int64_t i = 0; i < count; ++i) {
        files.emplace_back(p);
        p += files.back().size() + 1;
    }
    std::vector<int> rcs((size_t)count, 0);
    int64_t nt = num_threads < 1 ? 1 : num_threads;
    if (nt > count) nt = count;
    int64_t plane = h * w * c;
    if (nt == 1) {
        for (int64_t i = 0; i < count; ++i)
            rcs[(size_t)i] = decode_one(files[(size_t)i], out + i * plane, h, w, c);
    } else {
        std::atomic<int64_t> next(0);
        std::vector<std::thread> pool;
        for (int64_t t = 0; t < nt; ++t) {
            pool.emplace_back([&]() {
                for (;;) {
                    int64_t i = next.fetch_add(1);
                    if (i >= count) break;
                    rcs[(size_t)i] = decode_one(files[(size_t)i], out + i * plane, h, w, c);
                }
            });
        }
        for (auto& th : pool) th.join();
    }
    for (int64_t i = 0; i < count; ++i)
        if (rcs[(size_t)i] != 0) return rcs[(size_t)i];
    return 0;
}

int floodgan_native_version() { return 2; }
}
