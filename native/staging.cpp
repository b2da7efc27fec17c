// Native host-side image staging pipeline for the training loop.
//
// The reference stalls its hot loop on lazy, single-threaded PIL decodes
// (scene/cameras.py:126-136, train.py:172-173). This library is the
// TPU-framework runtime equivalent: a worker-thread pool that decodes PNG
// frames (libpng), optionally resizes (bilinear), composites the alpha mask,
// and loads the tongue segmentation — asynchronously, so the host pipeline
// overlaps the device step. Exposed through a plain C ABI for ctypes.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC staging.cpp -lpng -lpthread)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  std::vector<float> data;  // HWC, [0,1]
};

bool decode_png(const std::string& path, Image* out) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path.c_str())) return false;
  const bool has_alpha = (image.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  image.format = has_alpha ? PNG_FORMAT_RGBA : PNG_FORMAT_RGB;
  const int ch = has_alpha ? 4 : 3;
  std::vector<uint8_t> buf(static_cast<size_t>(PNG_IMAGE_SIZE(image)));
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  out->width = image.width;
  out->height = image.height;
  out->channels = ch;
  out->data.resize(buf.size());
  constexpr float kInv255 = 1.0f / 255.0f;
  for (size_t i = 0; i < buf.size(); ++i) out->data[i] = buf[i] * kInv255;
  return true;
}

void resize_bilinear(const Image& src, int w, int h, Image* dst) {
  dst->width = w;
  dst->height = h;
  dst->channels = src.channels;
  dst->data.resize(static_cast<size_t>(w) * h * src.channels);
  const float sx = static_cast<float>(src.width) / w;
  const float sy = static_cast<float>(src.height) / h;
  for (int y = 0; y < h; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy);
    if (y0 < 0) y0 = 0;
    int y1 = y0 + 1 < src.height ? y0 + 1 : src.height - 1;
    const float wy = fy - y0 < 0 ? 0 : fy - y0;
    for (int x = 0; x < w; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx);
      if (x0 < 0) x0 = 0;
      int x1 = x0 + 1 < src.width ? x0 + 1 : src.width - 1;
      const float wx = fx - x0 < 0 ? 0 : fx - x0;
      for (int c = 0; c < src.channels; ++c) {
        const float v00 = src.data[(y0 * src.width + x0) * src.channels + c];
        const float v01 = src.data[(y0 * src.width + x1) * src.channels + c];
        const float v10 = src.data[(y1 * src.width + x0) * src.channels + c];
        const float v11 = src.data[(y1 * src.width + x1) * src.channels + c];
        dst->data[(y * w + x) * src.channels + c] =
            (1 - wy) * ((1 - wx) * v00 + wx * v01) +
            wy * ((1 - wx) * v10 + wx * v11);
      }
    }
  }
}

struct Request {
  int64_t id;
  std::string path;
  std::string seg_path;  // empty = none
  int width;
  int height;
};

struct Result {
  bool ok = false;
  bool has_mask = false;
  bool has_seg = false;
  std::vector<float> img;   // CHW 3 x H x W (alpha-composited)
  std::vector<float> mask;  // 1 x H x W
  std::vector<float> seg;   // 1 x H x W
};

class Pool {
 public:
  explicit Pool(int workers) {
    stop_.store(false);
    for (int i = 0; i < workers; ++i) {
      threads_.emplace_back([this] { Work(); });
    }
  }

  ~Pool() { Shutdown(); }

  void Shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (stop_.load()) return;
      stop_.store(true);
    }
    cv_.notify_all();
    for (auto& t : threads_) {
      if (t.joinable()) t.join();
    }
  }

  void Submit(Request req) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push_back(std::move(req));
    }
    cv_.notify_one();
  }

  // blocks until the given id is done; returns and erases the result
  std::unique_ptr<Result> Fetch(int64_t id) {
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [this, id] { return done_.count(id) > 0; });
    auto res = std::move(done_[id]);
    done_.erase(id);
    return res;
  }

 private:
  void Work() {
    for (;;) {
      Request req;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_.load() || !queue_.empty(); });
        if (stop_.load() && queue_.empty()) return;
        if (queue_.empty()) continue;
        req = std::move(queue_.front());
        queue_.pop_front();
      }
      auto res = std::make_unique<Result>();
      Process(req, res.get());
      {
        std::lock_guard<std::mutex> lk(done_mu_);
        done_[req.id] = std::move(res);
      }
      done_cv_.notify_all();
    }
  }

  static void Process(const Request& req, Result* res) {
    Image raw;
    if (!decode_png(req.path, &raw)) return;
    Image img;
    if (raw.width != req.width || raw.height != req.height) {
      resize_bilinear(raw, req.width, req.height, &img);
    } else {
      img = std::move(raw);
    }
    const int w = img.width, h = img.height;
    res->img.resize(static_cast<size_t>(3) * w * h);
    if (img.channels == 4) {
      res->has_mask = true;
      res->mask.resize(static_cast<size_t>(w) * h);
    }
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        const float* p = &img.data[(y * w + x) * img.channels];
        const float a = img.channels == 4 ? p[3] : 1.0f;
        for (int c = 0; c < 3; ++c) {
          // alpha-mask multiply (reference Camera.load_image :135)
          res->img[(c * h + y) * w + x] = p[c] * a;
        }
        if (img.channels == 4) res->mask[y * w + x] = a;
      }
    }
    if (!req.seg_path.empty()) {
      Image seg_raw;
      if (decode_png(req.seg_path, &seg_raw)) {
        Image seg;
        if (seg_raw.width != w || seg_raw.height != h) {
          resize_bilinear(seg_raw, w, h, &seg);
        } else {
          seg = std::move(seg_raw);
        }
        res->has_seg = true;
        res->seg.resize(static_cast<size_t>(w) * h);
        for (int i = 0; i < w * h; ++i) {
          res->seg[i] = seg.data[static_cast<size_t>(i) * seg.channels];
        }
      }
    }
    res->ok = true;
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<Request> queue_;
  std::atomic<bool> stop_;
  std::vector<std::thread> threads_;

  std::mutex done_mu_;
  std::condition_variable done_cv_;
  std::unordered_map<int64_t, std::unique_ptr<Result>> done_;
};

Pool* g_pool = nullptr;

}  // namespace

extern "C" {

int staging_init(int workers) {
  if (g_pool != nullptr) return 0;
  g_pool = new Pool(workers > 0 ? workers : 2);
  return 1;
}

void staging_shutdown() {
  delete g_pool;
  g_pool = nullptr;
}

int staging_submit(int64_t id, const char* path, const char* seg_path,
                   int width, int height) {
  if (g_pool == nullptr) return 0;
  Request req;
  req.id = id;
  req.path = path;
  req.seg_path = seg_path != nullptr ? seg_path : "";
  req.width = width;
  req.height = height;
  g_pool->Submit(std::move(req));
  return 1;
}

// returns bitmask: 1 = ok, 2 = has mask, 4 = has seg; fills provided buffers
// (img: 3*H*W floats; mask/seg: H*W floats, may be null)
int staging_fetch(int64_t id, float* img, float* mask, float* seg) {
  if (g_pool == nullptr) return 0;
  auto res = g_pool->Fetch(id);
  if (res == nullptr || !res->ok) return 0;
  int flags = 1;
  std::memcpy(img, res->img.data(), res->img.size() * sizeof(float));
  if (res->has_mask && mask != nullptr) {
    std::memcpy(mask, res->mask.data(), res->mask.size() * sizeof(float));
    flags |= 2;
  }
  if (res->has_seg && seg != nullptr) {
    std::memcpy(seg, res->seg.data(), res->seg.size() * sizeof(float));
    flags |= 4;
  }
  return flags;
}

}  // extern "C"
