// envio: minimal native OpenEXR I/O shim for envutil_tpu.
//
// The reference relies on OpenImageIO for image I/O
// (envutil_basic.h:823-986 read_image_data, :710-817 save_array). This
// framework keeps the hot path in XLA and routes float image I/O
// through this small C++ library (OpenEXR scanline files with metadata
// attributes); LDR formats (png/jpg/tiff) go through Python imageio.
//
// C ABI, used from Python via ctypes. All pixel data is interleaved
// float32, row-major, top-down, `nch` channels per pixel.

#include <ImfInputFile.h>
#include <ImfOutputFile.h>
#include <ImfChannelList.h>
#include <ImfStringAttribute.h>
#include <ImfFloatAttribute.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImathBox.h>

#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

using namespace Imf;
using namespace Imath;

extern "C" {

// Read an EXR file. On success returns 0 and fills out parameters;
// *data is malloc'd interleaved float32 (caller frees via envio_free).
// Channel order: R,G,B,A when present; otherwise Y[,A]; otherwise the
// file's channel order. *nch is the channel count.
int envio_read_exr(const char* path, float** data, int* width,
                   int* height, int* nch) {
  try {
    InputFile file(path);
    Box2i dw = file.header().dataWindow();
    const int w = dw.max.x - dw.min.x + 1;
    const int h = dw.max.y - dw.min.y + 1;

    const ChannelList& channels = file.header().channels();
    std::vector<std::string> names;
    // preferred orderings
    const char* rgba[] = {"R", "G", "B", "A"};
    const char* ya[] = {"Y", "A"};
    for (const char* n : rgba)
      if (channels.findChannel(n)) names.push_back(n);
    if (names.empty()) {
      for (const char* n : ya)
        if (channels.findChannel(n)) names.push_back(n);
    }
    if (names.empty()) {
      for (auto it = channels.begin(); it != channels.end(); ++it)
        names.push_back(it.name());
    }
    const int c = static_cast<int>(names.size());
    if (c == 0) return -2;

    float* buf = static_cast<float*>(
        malloc(sizeof(float) * static_cast<size_t>(w) * h * c));
    if (!buf) return -3;

    FrameBuffer fb;
    const size_t xs = sizeof(float) * c;
    const size_t ys = xs * w;
    for (int i = 0; i < c; ++i) {
      char* base = reinterpret_cast<char*>(buf + i) -
                   (dw.min.x * xs + dw.min.y * ys);
      fb.insert(names[i], Slice(FLOAT, base, xs, ys, 1, 1, 0.0));
    }
    file.setFrameBuffer(fb);
    file.readPixels(dw.min.y, dw.max.y);

    *data = buf;
    *width = w;
    *height = h;
    *nch = c;
    return 0;
  } catch (...) {
    return -1;
  }
}

// Read a named string attribute into a malloc'd buffer (caller frees).
// Returns 0 on success, 1 if absent, <0 on error.
int envio_read_exr_string_attr(const char* path, const char* name,
                               char** value) {
  try {
    InputFile file(path);
    const StringAttribute* a =
        file.header().findTypedAttribute<StringAttribute>(name);
    if (!a) return 1;
    *value = strdup(a->value().c_str());
    return 0;
  } catch (...) {
    return -1;
  }
}

// Read a named float attribute. Returns 0 on success, 1 if absent.
int envio_read_exr_float_attr(const char* path, const char* name,
                              float* value) {
  try {
    InputFile file(path);
    const FloatAttribute* a =
        file.header().findTypedAttribute<FloatAttribute>(name);
    if (!a) return 1;
    *value = a->value();
    return 0;
  } catch (...) {
    return -1;
  }
}

// Write a scanline float EXR with optional string/float attributes.
// nch: 1 -> Y, 2 -> Y+A, 3 -> RGB, 4 -> RGBA.
int envio_write_exr(const char* path, const float* data, int width,
                    int height, int nch, const char** sattr_names,
                    const char** sattr_vals, int n_sattr,
                    const char** fattr_names, const float* fattr_vals,
                    int n_fattr) {
  try {
    static const char* names1[] = {"Y"};
    static const char* names2[] = {"Y", "A"};
    static const char* names3[] = {"R", "G", "B"};
    static const char* names4[] = {"R", "G", "B", "A"};
    const char** names;
    switch (nch) {
      case 1: names = names1; break;
      case 2: names = names2; break;
      case 3: names = names3; break;
      case 4: names = names4; break;
      default: return -2;
    }

    Header header(width, height);
    for (int i = 0; i < n_sattr; ++i)
      header.insert(sattr_names[i], StringAttribute(sattr_vals[i]));
    for (int i = 0; i < n_fattr; ++i)
      header.insert(fattr_names[i], FloatAttribute(fattr_vals[i]));
    for (int i = 0; i < nch; ++i)
      header.channels().insert(names[i], Channel(FLOAT));

    OutputFile file(path, header);
    FrameBuffer fb;
    const size_t xs = sizeof(float) * nch;
    const size_t ys = xs * width;
    for (int i = 0; i < nch; ++i) {
      char* base = const_cast<char*>(
          reinterpret_cast<const char*>(data + i));
      fb.insert(names[i], Slice(FLOAT, base, xs, ys));
    }
    file.setFrameBuffer(fb);
    file.writePixels(height);
    return 0;
  } catch (...) {
    return -1;
  }
}

void envio_free(void* p) { free(p); }

}  // extern "C"
