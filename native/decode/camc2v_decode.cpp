// camc2v native video decode stage (libavformat/libavcodec/libswscale).
//
// TPU-native replacement for the reference's decord VideoReader
// (reference: CamContextI2V/data/realestate10k.py:9,174): frame-accurate
// random access decode with keyframe seeking, RGB24 output, plus a
// multi-threaded prefetch pool that decodes whole clips ahead of the training
// loop so the host-side loader never stalls the TPU step.
//
// C ABI (consumed from Python via ctypes — camc2v_tpu/data/_native_decode.py):
//   vd_open / vd_close / vd_num_frames / vd_fps / vd_width / vd_height
//   vd_get_batch(handle, indices, n, out_rgb)   // out: n*H*W*3 uint8
//   vd_pool_create(n_threads) / vd_pool_destroy
//   vd_pool_submit(pool, path, indices, n)      // returns a ticket
//   vd_pool_fetch(pool, ticket, out_rgb, h, w)  // blocks until decoded
//
// Build: `make -C native/decode` (emits camc2v_tpu/data/libcamc2v_decode.so).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct VideoHandle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
  int width = 0, height = 0;      // source dims
  int out_width = 0, out_height = 0;  // sws output dims (== source unless scaled)
  double fps = 0.0;
  int64_t num_frames = 0;
  std::vector<int64_t> pts_index;  // frame index -> pts (built lazily)
  std::mutex mu;
};

bool build_pts_index(VideoHandle* h) {
  if (!h->pts_index.empty()) return true;
  AVPacket* pkt = av_packet_alloc();
  av_seek_frame(h->fmt, h->stream_idx, 0, AVSEEK_FLAG_BACKWARD);
  while (av_read_frame(h->fmt, pkt) >= 0) {
    if (pkt->stream_index == h->stream_idx) {
      int64_t ts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      h->pts_index.push_back(ts);
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  std::sort(h->pts_index.begin(), h->pts_index.end());
  h->num_frames = (int64_t)h->pts_index.size();
  av_seek_frame(h->fmt, h->stream_idx, 0, AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(h->codec);
  return !h->pts_index.empty();
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto h = std::make_unique<VideoHandle>();
  if (avformat_open_input(&h->fmt, path, nullptr, nullptr) < 0) return nullptr;
  if (avformat_find_stream_info(h->fmt, nullptr) < 0) return nullptr;
  h->stream_idx = av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (h->stream_idx < 0) return nullptr;
  AVStream* st = h->fmt->streams[h->stream_idx];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) return nullptr;
  h->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(h->codec, st->codecpar);
  h->codec->thread_count = 2;
  if (avcodec_open2(h->codec, dec, nullptr) < 0) return nullptr;
  h->width = h->codec->width;
  h->height = h->codec->height;
  AVRational fr = st->avg_frame_rate;
  h->fps = fr.den ? (double)fr.num / fr.den : 30.0;
  h->num_frames = st->nb_frames;
  if (h->num_frames <= 0) build_pts_index(h.get());
  h->out_width = h->width;
  h->out_height = h->height;
  h->sws = sws_getContext(h->width, h->height, h->codec->pix_fmt, h->width, h->height,
                          AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!h->sws) return nullptr;
  return h.release();
}

void vd_close(void* handle) {
  auto* h = (VideoHandle*)handle;
  if (!h) return;
  if (h->sws) sws_freeContext(h->sws);
  if (h->codec) avcodec_free_context(&h->codec);
  if (h->fmt) avformat_close_input(&h->fmt);
  delete h;
}

// Like vd_open, but the sws stage also does the loader's aspect-preserving
// resize (the pre-crop step of data/realestate10k.py::resize_center_crop)
// so frames cross the C<->Python boundary already at target scale and the
// GIL-holding finish() phase skips its per-frame cv2.resize. Dim formula
// matches the Python exactly (truncation, as the reference does).
void* vd_open_scaled(const char* path, int target_h, int target_w) {
  auto* h = (VideoHandle*)vd_open(path);
  if (!h || target_h <= 0 || target_w <= 0) return h;
  double ow = h->width, oh = h->height;
  int new_h, new_w;
  if (ow / oh > (double)target_w / target_h) {
    new_h = target_h;
    new_w = (int)(ow * target_h / oh);
  } else {
    new_h = (int)(oh * target_w / ow);
    new_w = target_w;
  }
  if (new_w == h->width && new_h == h->height) return h;
  sws_freeContext(h->sws);
  h->out_width = new_w;
  h->out_height = new_h;
  h->sws = sws_getContext(h->width, h->height, h->codec->pix_fmt, new_w, new_h,
                          AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!h->sws) { vd_close(h); return nullptr; }
  return h;
}

long vd_num_frames(void* handle) { return (long)((VideoHandle*)handle)->num_frames; }
double vd_fps(void* handle) { return ((VideoHandle*)handle)->fps; }
int vd_width(void* handle) { return ((VideoHandle*)handle)->out_width; }
int vd_height(void* handle) { return ((VideoHandle*)handle)->out_height; }

// Decode the requested (sorted or unsorted) frame indices into out_rgb
// (n * H * W * 3, caller-allocated). Returns 0 on success.
int vd_get_batch(void* handle, const long* indices, int n, unsigned char* out_rgb) {
  auto* h = (VideoHandle*)handle;
  std::lock_guard<std::mutex> lock(h->mu);
  if (!build_pts_index(h)) return -1;

  // map original positions so we can decode in ascending order
  std::vector<std::pair<long, int>> order(n);
  for (int i = 0; i < n; i++) order[i] = {indices[i], i};
  std::sort(order.begin(), order.end());

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  const size_t frame_bytes = (size_t)h->out_width * h->out_height * 3;

  int want = 0;              // position in `order`
  int64_t next_frame = -1;   // decoder cursor (frame counter)

  // seek to the keyframe at/before the first wanted frame
  long first = order[0].first;
  int64_t target_pts = h->pts_index[std::min<long>(first, h->num_frames - 1)];
  av_seek_frame(h->fmt, h->stream_idx, target_pts, AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(h->codec);

  int err = 0;
  bool draining = false;
  while (want < n) {
    if (!draining) {
      int ret = av_read_frame(h->fmt, pkt);
      if (ret < 0) {
        // EOF: flush the decoder to drain buffered frames
        draining = true;
        avcodec_send_packet(h->codec, nullptr);
      } else if (pkt->stream_index != h->stream_idx) {
        av_packet_unref(pkt);
        continue;
      } else {
        if (avcodec_send_packet(h->codec, pkt) < 0) { av_packet_unref(pkt); err = -3; break; }
        av_packet_unref(pkt);
      }
    }
    int got_any = 0;
    while (avcodec_receive_frame(h->codec, frame) >= 0 && want < n) {
      got_any = 1;
      int64_t ts = frame->pts != AV_NOPTS_VALUE ? frame->pts : frame->best_effort_timestamp;
      // frame counter = rank of ts in the pts index
      auto it = std::lower_bound(h->pts_index.begin(), h->pts_index.end(), ts);
      next_frame = it - h->pts_index.begin();
      while (want < n && next_frame == order[want].first) {
        unsigned char* dst = out_rgb + frame_bytes * order[want].second;
        uint8_t* dst_planes[1] = {dst};
        int dst_stride[1] = {3 * h->out_width};
        sws_scale(h->sws, frame->data, frame->linesize, 0, h->height, dst_planes, dst_stride);
        want++;
      }
      av_frame_unref(frame);
    }
    if (draining && !got_any) { err = -2; break; }  // decoder fully drained
  }
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return want == n ? 0 : (err ? err : -4);
}

// ------------------------------ prefetch pool ------------------------------

struct PoolJob {
  long ticket;
  std::string path;
  std::vector<long> indices;
  std::vector<unsigned char> rgb;
  int h = 0, w = 0;
  int target_h = 0, target_w = 0;  // >0: decode pre-scaled (vd_open_scaled)
  int status = 0;  // 0 pending, 1 done, <0 error
};

struct DecodePool {
  std::vector<std::thread> workers;
  std::deque<std::shared_ptr<PoolJob>> queue;
  std::map<long, std::shared_ptr<PoolJob>> done;
  std::mutex mu;
  std::condition_variable cv_submit, cv_done;
  std::atomic<long> next_ticket{1};
  bool stop = false;

  void worker() {
    while (true) {
      std::shared_ptr<PoolJob> job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_submit.wait(lock, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      void* h = job->target_h > 0 ? vd_open_scaled(job->path.c_str(), job->target_h, job->target_w)
                                   : vd_open(job->path.c_str());
      if (!h) {
        job->status = -1;
      } else {
        job->h = vd_height(h);
        job->w = vd_width(h);
        job->rgb.resize((size_t)job->indices.size() * job->h * job->w * 3);
        job->status = vd_get_batch(h, job->indices.data(), (int)job->indices.size(), job->rgb.data());
        if (job->status == 0) job->status = 1;
        vd_close(h);
      }
      {
        std::lock_guard<std::mutex> lock(mu);
        done[job->ticket] = job;
      }
      cv_done.notify_all();
    }
  }
};

void* vd_pool_create(int n_threads) {
  auto* p = new DecodePool();
  for (int i = 0; i < n_threads; i++) p->workers.emplace_back([p] { p->worker(); });
  return p;
}

void vd_pool_destroy(void* pool) {
  auto* p = (DecodePool*)pool;
  {
    std::lock_guard<std::mutex> lock(p->mu);
    p->stop = true;
  }
  p->cv_submit.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

long vd_pool_submit_scaled(void* pool, const char* path, const long* indices, int n,
                           int target_h, int target_w) {
  auto* p = (DecodePool*)pool;
  auto job = std::make_shared<PoolJob>();
  job->ticket = p->next_ticket++;
  job->path = path;
  job->indices.assign(indices, indices + n);
  job->target_h = target_h;
  job->target_w = target_w;
  {
    std::lock_guard<std::mutex> lock(p->mu);
    p->queue.push_back(job);
  }
  p->cv_submit.notify_one();
  return job->ticket;
}

long vd_pool_submit(void* pool, const char* path, const long* indices, int n) {
  return vd_pool_submit_scaled(pool, path, indices, n, 0, 0);
}

// Blocks until the job completes; copies frames out. Returns 0 ok, <0 error.
int vd_pool_fetch(void* pool, long ticket, unsigned char* out_rgb, int* out_h, int* out_w) {
  auto* p = (DecodePool*)pool;
  std::shared_ptr<PoolJob> job;
  {
    std::unique_lock<std::mutex> lock(p->mu);
    p->cv_done.wait(lock, [&] { return p->done.count(ticket) > 0; });
    job = p->done[ticket];
    p->done.erase(ticket);
  }
  if (job->status < 0) return job->status;
  *out_h = job->h;
  *out_w = job->w;
  std::memcpy(out_rgb, job->rgb.data(), job->rgb.size());
  return 0;
}

// Blocks until the job completes and reports frame dims WITHOUT consuming the
// job, so the caller can size the destination buffer before vd_pool_fetch
// (clip dimensions vary per video in RealEstate10K). Returns 0 ok, <0 error
// (an errored job is consumed here).
int vd_pool_dims(void* pool, long ticket, int* out_h, int* out_w) {
  auto* p = (DecodePool*)pool;
  std::shared_ptr<PoolJob> job;
  {
    std::unique_lock<std::mutex> lock(p->mu);
    p->cv_done.wait(lock, [&] { return p->done.count(ticket) > 0; });
    job = p->done[ticket];
    if (job->status < 0) p->done.erase(ticket);
  }
  if (job->status < 0) return job->status;
  *out_h = job->h;
  *out_w = job->w;
  return 0;
}

}  // extern "C"
