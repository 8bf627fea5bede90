// Standalone self-test driver for the native decode library — built under
// ASan/TSan by tools/native_sanitize.sh (the rebuild's answer to the
// reference substrate's sanitizer coverage, SURVEY.md §5.2: XLA device code
// is race-free by construction; the C++ host library is what needs
// sanitizers).
//
// Usage: selftest <out.f32-ignored> <jpeg...> [--video <file>]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int vd_decode_jpeg_batch(const char** paths, int n, float* out, int ow, int oh,
                         int letterbox, int pad_value, float* affines,
                         int* orig_sizes, int num_threads);
void* vd_video_open(const char* path, int ow, int oh, int letterbox,
                    int pad_value, int every, int ring_capacity);
long long vd_video_read(void* handle, float* out, float* affine);
void vd_video_info(void* handle, int* w, int* h, double* fps);
void vd_video_close(void* handle);
}

int main(int argc, char** argv) {
  std::vector<const char*> jpegs;
  const char* video = nullptr;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--video") && i + 1 < argc) {
      video = argv[++i];
    } else {
      jpegs.push_back(argv[i]);
    }
  }
  const int ow = 128, oh = 128;
  if (!jpegs.empty()) {
    int n = static_cast<int>(jpegs.size());
    std::vector<float> out(static_cast<size_t>(n) * ow * oh * 3);
    std::vector<float> affines(n * 4);
    std::vector<int> orig(n * 2);
    // run twice: once threaded, once single-threaded (exercise both paths)
    int ok1 = vd_decode_jpeg_batch(jpegs.data(), n, out.data(), ow, oh, 1, 128,
                                   affines.data(), orig.data(), 4);
    int ok2 = vd_decode_jpeg_batch(jpegs.data(), n, out.data(), ow, oh, 0, 128,
                                   affines.data(), orig.data(), 1);
    std::printf("jpeg batch: %d/%d, %d/%d decoded\n", ok1, n, ok2, n);
    if (ok1 != n || ok2 != n) return 1;
  }
  if (video) {
    void* h = vd_video_open(video, ow, oh, 1, 128, 1, 8);
    if (!h) {
      std::printf("video open failed\n");
      return 1;
    }
    int w, hh;
    double fps;
    vd_video_info(h, &w, &hh, &fps);
    std::vector<float> frame(static_cast<size_t>(ow) * oh * 3);
    float affine[4];
    long long count = 0;
    while (vd_video_read(h, frame.data(), affine) >= 0) ++count;
    vd_video_close(h);
    std::printf("video: %dx%d @%.1f, %lld frames\n", w, hh, fps, count);
    if (count == 0) return 1;

    // early-close path: open, read one frame, close while decode thread live
    h = vd_video_open(video, ow, oh, 1, 128, 1, 2);
    vd_video_read(h, frame.data(), affine);
    vd_video_close(h);
    std::printf("early close ok\n");
  }
  std::printf("selftest ok\n");
  return 0;
}
