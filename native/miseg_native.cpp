// Native data-path runtime for the TPU segmentation framework.
//
// The host-side input pipeline (NIfTI gunzip + decode + Fortran->C
// reorder + CT intensity windowing) is the per-volume hot path that
// feeds the TPU; this library implements it in C++ (zlib + OpenMP-free
// portable loops) and is bound through ctypes
// (medical_image_segmentation_with_visual_prompts_tpu/data/native.py)
// with a transparent numpy fallback when the shared object is absent.
//
// Exposed C ABI:
//   miseg_gunzip          - inflate a whole .gz buffer (gzip framing)
//   miseg_decode_f32      - NIfTI payload -> float32 C-order volume with
//                           scl_slope/inter applied
//   miseg_scale_intensity - ScaleIntensityRange(a_min,a_max,b_min,b_max,clip)
//   miseg_extract_windows - strided sliding-window gather (host fallback
//                           mirror of the device-side extractor)

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

extern "C" {

// Inflate a gzip stream. Returns the number of bytes written to `out`
// (<= out_cap), or -1 on error.
long long miseg_gunzip(const unsigned char* in, long long in_len,
                       unsigned char* out, long long out_cap) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return -1;
    zs.next_in = const_cast<unsigned char*>(in);
    zs.avail_in = static_cast<uInt>(in_len);
    zs.next_out = out;
    zs.avail_out = static_cast<uInt>(out_cap);
    int ret = inflate(&zs, Z_FINISH);
    long long written = static_cast<long long>(zs.total_out);
    inflateEnd(&zs);
    if (ret != Z_STREAM_END && ret != Z_OK && ret != Z_BUF_ERROR) return -1;
    return written;
}

// Decode a NIfTI data payload into a float32 C-order array.
//   dtype_code: NIfTI datatype (2,4,8,16,64,256,512,768)
//   dims: [h, w, d] of the volume (Fortran-ordered payload)
//   slope/inter: scl_slope / scl_inter (slope 0 treated as 1)
// out must hold h*w*d floats.
int miseg_decode_f32(const unsigned char* payload, int dtype_code,
                     const long long* dims, float slope, float inter,
                     float* out) {
    const long long h = dims[0], w = dims[1], d = dims[2];
    if (slope == 0.0f) slope = 1.0f;
    const bool ident = (slope == 1.0f && inter == 0.0f);

    // Cache-blocked Fortran->C transpose: tile the (i, k) axes so both
    // the strided reads and strided writes stay within L1/L2 lines.
    constexpr long long BI = 64, BK = 64;
#define DECODE_LOOP(T)                                                     \
    {                                                                      \
        const T* src = reinterpret_cast<const T*>(payload);                \
        for (long long i0 = 0; i0 < h; i0 += BI)                           \
            for (long long k0 = 0; k0 < d; k0 += BK) {                     \
                const long long i1 = i0 + BI < h ? i0 + BI : h;            \
                const long long k1 = k0 + BK < d ? k0 + BK : d;            \
                for (long long j = 0; j < w; ++j)                          \
                    for (long long i = i0; i < i1; ++i) {                  \
                        const T* s = src + i + h * (j + w * k0);           \
                        float* o = out + (i * w + j) * d + k0;             \
                        const long long stride = h * w;                    \
                        for (long long k = k0; k < k1; ++k) {              \
                            float v = static_cast<float>(*s);              \
                            *o++ = ident ? v : v * slope + inter;          \
                            s += stride;                                   \
                        }                                                  \
                    }                                                      \
            }                                                              \
    }

    switch (dtype_code) {
        case 2: DECODE_LOOP(uint8_t); break;
        case 4: DECODE_LOOP(int16_t); break;
        case 8: DECODE_LOOP(int32_t); break;
        case 16: DECODE_LOOP(float); break;
        case 64: DECODE_LOOP(double); break;
        case 256: DECODE_LOOP(int8_t); break;
        case 512: DECODE_LOOP(uint16_t); break;
        case 768: DECODE_LOOP(uint32_t); break;
        default: return -1;
    }
#undef DECODE_LOOP
    return 0;
}

// In-place ScaleIntensityRange (transforms.py equivalent).
void miseg_scale_intensity(float* data, long long n, float a_min,
                           float a_max, float b_min, float b_max,
                           int clip) {
    const float scale = (b_max - b_min) / (a_max - a_min);
    for (long long i = 0; i < n; ++i) {
        float v = (data[i] - a_min) * scale + b_min;
        if (clip) {
            v = v < b_min ? b_min : (v > b_max ? b_max : v);
        }
        data[i] = v;
    }
}

// Gather sliding windows from a C-order [H, W, D, C] volume.
//   starts: [n_windows, 3] window origins; window: [wh, ww, wd]
//   out: [n_windows, wh, ww, wd, C]
void miseg_extract_windows(const float* vol, const long long* shape,
                           const long long* starts, long long n_windows,
                           const long long* window, float* out) {
    const long long W = shape[1], D = shape[2], C = shape[3];
    const long long wh = window[0], ww = window[1], wd = window[2];
    const long long row = D * C;          // stride of one w step
    const long long plane = W * row;      // stride of one h step
    const long long out_win = wh * ww * wd * C;
    for (long long n = 0; n < n_windows; ++n) {
        const long long h0 = starts[n * 3], w0 = starts[n * 3 + 1],
                        d0 = starts[n * 3 + 2];
        float* dst = out + n * out_win;
        for (long long i = 0; i < wh; ++i)
            for (long long j = 0; j < ww; ++j) {
                const float* src =
                    vol + (h0 + i) * plane + (w0 + j) * row + d0 * C;
                std::memcpy(dst, src, sizeof(float) * wd * C);
                dst += wd * C;
            }
    }
}

}  // extern "C"
