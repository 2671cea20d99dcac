// Minimal uncompressed-AVI (RGB24 'DIB ') video writer.
//
// Native runtime component of the TPU LBM engine's observability path: the
// reference links OpenCV+ffmpeg for its MP4 writers (src/visualize.cpp);
// this standalone C++ encoder produces playable .avi files with zero
// external dependencies. Frames arrive as RGB8 top-down rows from the
// device render kernel (lbm_tpu/io/colormap.py) and are stored bottom-up
// BGR as the BITMAPINFOHEADER convention requires.
//
// Exposed as a tiny C ABI consumed via ctypes (lbm_tpu/io/avi.py).
//
// Build: g++ -O2 -shared -fPIC -o libaviwriter.so aviwriter.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct AviWriter {
    FILE* fp = nullptr;
    uint32_t width = 0, height = 0, fps = 1;
    uint32_t frame_count = 0;
    uint32_t frame_bytes = 0;      // padded RGB24 payload size
    std::vector<uint8_t> scratch;  // one converted frame
    std::vector<uint32_t> sizes;   // per-frame chunk sizes for idx1
    long riff_size_pos = 0, movi_size_pos = 0;
    long frames_pos_hdrl = 0, frames_pos_strh = 0;
};

void put_le32(AviWriter* w, uint32_t v) {
    uint8_t b[4] = {uint8_t(v), uint8_t(v >> 8), uint8_t(v >> 16), uint8_t(v >> 24)};
    std::fwrite(b, 1, 4, w->fp);
}

void put_le16(AviWriter* w, uint16_t v) {
    uint8_t b[2] = {uint8_t(v), uint8_t(v >> 8)};
    std::fwrite(b, 1, 2, w->fp);
}

void put_fourcc(AviWriter* w, const char* cc) { std::fwrite(cc, 1, 4, w->fp); }

}  // namespace

extern "C" {

// Returns an opaque handle, or null on failure.
void* avi_open(const char* path, uint32_t width, uint32_t height, uint32_t fps) {
    auto* w = new AviWriter();
    w->fp = std::fopen(path, "wb");
    if (!w->fp) { delete w; return nullptr; }
    w->width = width; w->height = height; w->fps = fps ? fps : 1;
    const uint32_t row = width * 3;
    const uint32_t padded_row = (row + 3u) & ~3u;  // 4-byte aligned rows
    w->frame_bytes = padded_row * height;
    w->scratch.resize(w->frame_bytes);

    // ---- RIFF header (sizes patched on close) ----
    put_fourcc(w, "RIFF");
    w->riff_size_pos = std::ftell(w->fp); put_le32(w, 0);
    put_fourcc(w, "AVI ");

    // hdrl list
    put_fourcc(w, "LIST");
    put_le32(w, 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 40);  // hdrl payload size
    put_fourcc(w, "hdrl");

    // avih: main header (56 bytes)
    put_fourcc(w, "avih"); put_le32(w, 56);
    put_le32(w, 1000000u / w->fps);       // microseconds per frame
    put_le32(w, w->frame_bytes * w->fps); // max bytes per second
    put_le32(w, 0);                        // padding granularity
    put_le32(w, 0x10);                     // flags: AVIF_HASINDEX
    w->frames_pos_hdrl = std::ftell(w->fp); put_le32(w, 0);  // total frames
    put_le32(w, 0);                        // initial frames
    put_le32(w, 1);                        // streams
    put_le32(w, w->frame_bytes);           // suggested buffer size
    put_le32(w, width); put_le32(w, height);
    for (int i = 0; i < 4; ++i) put_le32(w, 0);  // reserved

    // strl list
    put_fourcc(w, "LIST");
    put_le32(w, 4 + 8 + 56 + 8 + 40);
    put_fourcc(w, "strl");

    // strh: stream header (56 bytes)
    put_fourcc(w, "strh"); put_le32(w, 56);
    put_fourcc(w, "vids"); put_fourcc(w, "DIB ");
    put_le32(w, 0); put_le16(w, 0); put_le16(w, 0);
    put_le32(w, 0);                        // initial frames
    put_le32(w, 1);                        // scale
    put_le32(w, w->fps);                   // rate (fps = rate/scale)
    put_le32(w, 0);                        // start
    w->frames_pos_strh = std::ftell(w->fp); put_le32(w, 0);  // length (frames)
    put_le32(w, w->frame_bytes);           // suggested buffer size
    put_le32(w, 0xFFFFFFFFu);              // quality
    put_le32(w, 0);                        // sample size
    put_le16(w, 0); put_le16(w, 0);        // rcFrame
    put_le16(w, uint16_t(width)); put_le16(w, uint16_t(height));

    // strf: BITMAPINFOHEADER (40 bytes)
    put_fourcc(w, "strf"); put_le32(w, 40);
    put_le32(w, 40);
    put_le32(w, width); put_le32(w, height);
    put_le16(w, 1); put_le16(w, 24);       // planes, bpp
    put_le32(w, 0);                        // BI_RGB
    put_le32(w, w->frame_bytes);
    put_le32(w, 0); put_le32(w, 0); put_le32(w, 0); put_le32(w, 0);

    // movi list (size patched on close)
    put_fourcc(w, "LIST");
    w->movi_size_pos = std::ftell(w->fp); put_le32(w, 0);
    put_fourcc(w, "movi");
    return w;
}

// rgb: height*width*3 bytes, top-down RGB (as rendered). Returns 0 on ok.
int avi_write_frame(void* handle, const uint8_t* rgb) {
    auto* w = static_cast<AviWriter*>(handle);
    if (!w || !w->fp) return 1;
    const uint32_t row = w->width * 3;
    const uint32_t padded_row = (row + 3u) & ~3u;
    // convert to bottom-up BGR with row padding
    for (uint32_t y = 0; y < w->height; ++y) {
        const uint8_t* src = rgb + (w->height - 1 - y) * row;
        uint8_t* dst = w->scratch.data() + y * padded_row;
        for (uint32_t x = 0; x < w->width; ++x) {
            dst[3 * x + 0] = src[3 * x + 2];
            dst[3 * x + 1] = src[3 * x + 1];
            dst[3 * x + 2] = src[3 * x + 0];
        }
        std::memset(dst + row, 0, padded_row - row);
    }
    put_fourcc(w, "00db");
    put_le32(w, w->frame_bytes);
    std::fwrite(w->scratch.data(), 1, w->frame_bytes, w->fp);
    w->sizes.push_back(w->frame_bytes);
    w->frame_count++;
    return 0;
}

int avi_close(void* handle) {
    auto* w = static_cast<AviWriter*>(handle);
    if (!w) return 1;
    if (w->fp) {
        // idx1 index
        put_fourcc(w, "idx1");
        put_le32(w, w->frame_count * 16);
        uint32_t offset = 4;  // relative to 'movi' fourcc
        for (uint32_t i = 0; i < w->frame_count; ++i) {
            put_fourcc(w, "00db");
            put_le32(w, 0x10);  // AVIIF_KEYFRAME
            put_le32(w, offset);
            put_le32(w, w->sizes[i]);
            offset += 8 + w->sizes[i];
        }
        const long end = std::ftell(w->fp);
        // patch sizes/counts
        std::fseek(w->fp, w->riff_size_pos, SEEK_SET);
        put_le32(w, uint32_t(end - w->riff_size_pos - 4));
        std::fseek(w->fp, w->frames_pos_hdrl, SEEK_SET);
        put_le32(w, w->frame_count);
        std::fseek(w->fp, w->frames_pos_strh, SEEK_SET);
        put_le32(w, w->frame_count);
        const long movi_end = end - long(8 + 16 * w->frame_count);
        std::fseek(w->fp, w->movi_size_pos, SEEK_SET);
        put_le32(w, uint32_t(movi_end - w->movi_size_pos - 4));
        std::fclose(w->fp);
    }
    delete w;
    return 0;
}

}  // extern "C"
