// Native TIFF decode path for the training input pipeline.
//
// The reference decodes GeoTIFF stacks per item in python (tifffile) inside
// its DataLoader (reference models/data.py:64-68) — the dominant host-side
// cost.  This library decodes batches of baseline TIFFs (uncompressed or
// zlib/deflate strips, uint8/uint16/float32, contiguous planar) directly
// into a caller-provided float32 HWC buffer on a std::thread pool, with no
// python object churn; python binds via ctypes (no pybind11 in the image).
//
// Wire-format coverage matches floodgan_tpu/data/tiff.py (the pure-python
// twin used as fallback and golden reference in tests).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

struct Reader {
    const uint8_t* data;
    size_t size;
    bool big_endian;

    uint16_t u16(size_t off) const {
        if (off + 2 > size) return 0;
        return big_endian ? (uint16_t)((data[off] << 8) | data[off + 1])
                          : (uint16_t)(data[off] | (data[off + 1] << 8));
    }
    uint32_t u32(size_t off) const {
        if (off + 4 > size) return 0;
        return big_endian
                   ? ((uint32_t)data[off] << 24) | ((uint32_t)data[off + 1] << 16) |
                         ((uint32_t)data[off + 2] << 8) | data[off + 3]
                   : (uint32_t)data[off] | ((uint32_t)data[off + 1] << 8) |
                         ((uint32_t)data[off + 2] << 16) | ((uint32_t)data[off + 3] << 24);
    }
};

struct TiffInfo {
    uint32_t width = 0, height = 0;
    uint16_t spp = 1, bits = 8, compression = 1, sample_format = 1;
    std::vector<uint32_t> strip_offsets, strip_counts;
};

constexpr int kTypeSizes[13] = {0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8};

bool parse_ifd(const Reader& r, TiffInfo* info) {
    if (r.size < 8) return false;
    uint32_t ifd = r.u32(4);
    if (ifd + 2 > r.size) return false;
    uint16_t n = r.u16(ifd);
    for (uint16_t i = 0; i < n; ++i) {
        size_t e = ifd + 2 + 12 * (size_t)i;
        uint16_t tag = r.u16(e), type = r.u16(e + 2);
        uint32_t count = r.u32(e + 4);
        if (type > 12) continue;
        size_t vsize = (size_t)kTypeSizes[type] * count;
        size_t voff = vsize > 4 ? r.u32(e + 8) : e + 8;
        auto val = [&](uint32_t idx) -> uint32_t {
            size_t o = voff + (size_t)kTypeSizes[type] * idx;
            return type == 3 ? r.u16(o) : r.u32(o);
        };
        switch (tag) {
            case 256: info->width = val(0); break;
            case 257: info->height = val(0); break;
            case 258: info->bits = (uint16_t)val(0); break;
            case 259: info->compression = (uint16_t)val(0); break;
            case 273:
                info->strip_offsets.resize(count);
                for (uint32_t k = 0; k < count; ++k) info->strip_offsets[k] = val(k);
                break;
            case 277: info->spp = (uint16_t)val(0); break;
            case 279:
                info->strip_counts.resize(count);
                for (uint32_t k = 0; k < count; ++k) info->strip_counts[k] = val(k);
                break;
            case 339: info->sample_format = (uint16_t)val(0); break;
            default: break;
        }
    }
    return info->width && info->height && !info->strip_offsets.empty() &&
           info->strip_offsets.size() == info->strip_counts.size();
}

bool inflate_strip(const uint8_t* src, size_t src_len, uint8_t* dst, size_t dst_cap,
                   size_t* written) {
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

// byteswap helpers for big-endian files
template <typename T>
T bswap(T v);
template <>
uint16_t bswap(uint16_t v) { return (uint16_t)((v >> 8) | (v << 8)); }
template <>
uint32_t bswap(uint32_t v) {
    return (v >> 24) | ((v >> 8) & 0xff00u) | ((v << 8) & 0xff0000u) | (v << 24);
}

// Decode one TIFF file's payload into float32 HWC [0..] (uint kinds are
// copied verbatim as their numeric value; normalisation happens on device).
int decode_one(const std::string& path, float* out, int64_t out_h, int64_t out_w,
               int64_t out_c) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)fsize);
    if (std::fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
        std::fclose(f);
        return -2;
    }
    std::fclose(f);

    Reader r{buf.data(), (size_t)fsize, false};
    if (fsize < 8) return -3;
    if (buf[0] == 'M' && buf[1] == 'M') r.big_endian = true;
    else if (!(buf[0] == 'I' && buf[1] == 'I')) return -3;
    if (r.u16(2) != 42) return -3;

    TiffInfo info;
    if (!parse_ifd(r, &info)) return -4;
    if ((int64_t)info.height != out_h || (int64_t)info.width != out_w ||
        (int64_t)info.spp != out_c)
        return -5;

    size_t bytes_per_sample = info.bits / 8;
    size_t total = (size_t)info.height * info.width * info.spp * bytes_per_sample;
    std::vector<uint8_t> raw(total);
    size_t pos = 0;
    for (size_t s = 0; s < info.strip_offsets.size(); ++s) {
        const uint8_t* src = buf.data() + info.strip_offsets[s];
        size_t cnt = info.strip_counts[s];
        if (info.strip_offsets[s] + cnt > (size_t)fsize) return -6;
        if (info.compression == 1) {
            if (pos + cnt > total) return -6;
            std::memcpy(raw.data() + pos, src, cnt);
            pos += cnt;
        } else if (info.compression == 8 || info.compression == 32946) {
            size_t written = 0;
            if (!inflate_strip(src, cnt, raw.data() + pos, total - pos, &written)) return -7;
            pos += written;
        } else {
            return -8;  // unsupported compression -> python fallback
        }
    }

    size_t n = (size_t)info.height * info.width * info.spp;
    if (info.sample_format == 3 && info.bits == 32) {
        const uint32_t* p = reinterpret_cast<const uint32_t*>(raw.data());
        for (size_t i = 0; i < n; ++i) {
            uint32_t v = r.big_endian ? bswap(p[i]) : p[i];
            float fv;
            std::memcpy(&fv, &v, 4);
            out[i] = fv;
        }
    } else if (info.sample_format != 3 && info.bits == 8) {
        for (size_t i = 0; i < n; ++i) out[i] = (float)raw[i];
    } else if (info.sample_format != 3 && info.bits == 16) {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(raw.data());
        for (size_t i = 0; i < n; ++i) out[i] = (float)(r.big_endian ? bswap(p[i]) : p[i]);
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
    std::vector<int> rcs(count, 0);
    int64_t nt = num_threads < 1 ? 1 : num_threads;
    std::vector<std::thread> pool;
    std::atomic<int64_t>* next = new std::atomic<int64_t>(0);
    int64_t plane = h * w * c;
    for (int64_t t = 0; t < nt; ++t) {
        pool.emplace_back([&, t]() {
            for (;;) {
                int64_t i = next->fetch_add(1);
                if (i >= count) break;
                rcs[i] = decode_one(files[i], out + i * plane, h, w, c);
            }
        });
    }
    for (auto& th : pool) th.join();
    delete next;
    for (int64_t i = 0; i < count; ++i)
        if (rcs[i] != 0) return rcs[i];
    return 0;
}

int floodgan_native_version() { return 1; }
}
