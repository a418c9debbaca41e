// superpoint_serve: native real-time feature serving over PJRT.
//
// TPU-native replacement of the reference C++ demo (/root/reference/cpp/src/
// main.cc): compiles the exported detect+describe+match program (see
// `SuperPointFrontend.export_pjrt`) and streams frames through it.  Matching
// already happens on-chip as a GEMM inside the program (the reference scans
// descriptors linearly on the CPU, main.cc:9-29), so the host only feeds
// frames and reads fixed-K results.
//
// Frame sources (camera.{h,cc}, reference parity: cpp/src/camera.cc:4-23):
//   --source synthetic      drifting checkerboard (default; no hardware)
//   --source /dev/videoN    live V4L2 capture (also bare "N" like the
//                           reference CLI's camera index)
//   --source frames.raw     replay of concatenated raw float32 HWC frames
//   --input frame.raw       one static raw frame repeated every iteration
//
// The frame loop is a software pipeline (--pipeline N, default 2): frame
// f+1's upload+execute are enqueued BEFORE awaiting frame f's output fetch,
// so the relay/PCIe round trips of consecutive frames overlap.  The
// reference app is fully synchronous per frame (main.cc:77-143); on a
// relayed plugin the pipeline hides most of the ~33 ms/frame round-trip
// cost (PJRT buffers are futures — outputs can even feed the next execute
// before the producing computation finishes).
//
// Usage:
//   superpoint_serve --model DIR [--plugin /opt/axon/libaxon_pjrt.so]
//                    [--frames 100] [--source SPEC] [--input frame.raw]
//                    [--pipeline N]

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <string>
#include <vector>

#include "camera.h"
#include "pjrt_runtime.h"

namespace {

// --- minimal parsing of the known meta.json layout ---------------------------

long json_int(const std::string& s, const std::string& key) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) throw std::runtime_error("meta missing " + key);
  pos = s.find(':', pos);
  return std::strtol(s.c_str() + pos + 1, nullptr, 10);
}

long json_int_or(const std::string& s, const std::string& key, long dflt) {
  if (s.find("\"" + key + "\"") == std::string::npos) return dflt;
  return json_int(s, key);
}

std::vector<long> json_int_list(const std::string& s, const std::string& key) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) throw std::runtime_error("meta missing " + key);
  auto open = s.find('[', pos);
  auto close = s.find(']', open);
  std::vector<long> out;
  const char* p = s.c_str() + open + 1;
  while (p < s.c_str() + close) {
    char* end = nullptr;
    long v = std::strtol(p, &end, 10);
    if (end == p) break;
    out.push_back(v);
    p = end + 1;
  }
  return out;
}

PJRT_Buffer_Type dtype_of(const std::string& name) {
  if (name == "f32") return PJRT_Buffer_Type_F32;
  if (name == "f16") return PJRT_Buffer_Type_F16;
  if (name == "s32") return PJRT_Buffer_Type_S32;
  if (name == "s16") return PJRT_Buffer_Type_S16;
  if (name == "u8") return PJRT_Buffer_Type_U8;
  if (name == "pred") return PJRT_Buffer_Type_PRED;
  throw std::runtime_error("unknown dtype " + name);
}

std::string json_str(const std::string& s, const std::string& key,
                     const std::string& dflt) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return dflt;
  auto q1 = s.find('"', s.find(':', pos));
  auto q2 = s.find('"', q1 + 1);
  return s.substr(q1 + 1, q2 - q1 - 1);
}

struct Spec {
  std::string name;
  std::vector<int64_t> shape;
  PJRT_Buffer_Type type;
};

// Parse the "inputs"/"outputs" arrays of meta.json.
std::vector<Spec> parse_specs(const std::string& s, const std::string& section) {
  std::vector<Spec> specs;
  auto pos = s.find("\"" + section + "\"");
  auto end = s.find(']', s.rfind('}', s.find(']', pos)));
  // walk objects
  auto obj = s.find('{', pos);
  auto section_end = pos;
  {  // find the matching close bracket of the section array
    int depth = 0;
    size_t i = s.find('[', pos);
    for (; i < s.size(); ++i) {
      if (s[i] == '[') depth++;
      if (s[i] == ']' && --depth == 0) break;
    }
    section_end = i;
  }
  while (obj != std::string::npos && obj < section_end) {
    auto close = s.find('}', obj);
    std::string body = s.substr(obj, close - obj + 1);
    Spec spec;
    auto n0 = body.find("\"name\"");
    auto q1 = body.find('"', body.find(':', n0));
    auto q2 = body.find('"', q1 + 1);
    spec.name = body.substr(q1 + 1, q2 - q1 - 1);
    for (long d : json_int_list(body, "shape")) spec.shape.push_back(d);
    auto d0 = body.find("\"dtype\"");
    auto p1 = body.find('"', body.find(':', d0));
    auto p2 = body.find('"', p1 + 1);
    spec.type = dtype_of(body.substr(p1 + 1, p2 - p1 - 1));
    specs.push_back(spec);
    obj = s.find('{', close);
  }
  (void)end;
  return specs;
}

// Create options required by the axon relay plugin (mirrors the options its
// Python registration passes; see /root/.axon_site/axon/register).  Topology
// comes from PALLAS_AXON_TPU_GEN; session_id is fresh per process.
std::vector<fpc::CreateOption> AxonDefaultOptions() {
  // Mirror the env bridging the Python sitecustomize performs
  // (/root/.axon_site/sitecustomize.py): route the pool claim through the
  // loopback relay when PALLAS_AXON_POOL_IPS is configured.
  if (std::getenv("PALLAS_AXON_POOL_IPS") != nullptr) {
    setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", /*overwrite=*/0);
    setenv("AXON_LOOPBACK_RELAY", "1", 0);
    setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
  }
  const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
  std::string topology = std::string(gen ? gen : "v5e") + ":1x1x1";
  std::srand(static_cast<unsigned>(
      std::chrono::steady_clock::now().time_since_epoch().count()));
  char session[64];
  std::snprintf(session, sizeof(session), "serve-%08x-%08x", std::rand(),
                std::rand());
  return {
      fpc::CreateOption::Int("remote_compile", 1),
      fpc::CreateOption::Int("local_only", 0),
      fpc::CreateOption::Int("priority", 0),
      fpc::CreateOption::Str("topology", topology),
      fpc::CreateOption::Int("n_slices", 1),
      fpc::CreateOption::Str("session_id", session),
      fpc::CreateOption::Int("rank", 4294967295LL),
  };
}

}  // namespace

int main(int argc, char** argv) {
  setvbuf(stdout, nullptr, _IOLBF, 0);
  std::string model_dir;
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::string input_file;
  std::string source = "synthetic";
  int frames = 20;
  std::string pipeline = "2";
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) throw std::runtime_error("missing value for " + a);
      return argv[++i];
    };
    if (a == "--model") model_dir = next();
    else if (a == "--plugin") plugin = next();
    else if (a == "--frames") frames = std::atoi(next().c_str());
    else if (a == "--input") input_file = next();
    else if (a == "--source") source = next();
    else if (a == "--pipeline") pipeline = next();
    else {
      std::fprintf(stderr,
                   "usage: %s --model DIR [--plugin SO] [--frames N] "
                   "[--input frame.raw] [--pipeline N[,N,...]] "
                   "[--source synthetic|N|/dev/videoN|frames.raw]\n",
                   argv[0]);
      return 2;
    }
  }
  if (model_dir.empty()) {
    std::fprintf(stderr, "error: --model is required\n");
    return 2;
  }

  try {
    std::string meta = fpc::read_file(model_dir + "/meta.json");
    const long h = json_int_list(meta, "image_size")[0];
    const long w = json_int_list(meta, "image_size")[1];
    const long c = json_int(meta, "channels");
    const long k = json_int(meta, "max_keypoints");
    // "packed" ABI: num_valid + top-N rows (f32 coords, f16 descriptors)
    // instead of full fixed-K f32 arrays (see SuperPointFrontend.export_pjrt)
    // — a much smaller per-frame readback on a bandwidth-bound link
    const bool packed = json_str(meta, "abi", "full") == "packed";
    const long top_n = packed ? json_int(meta, "top_n") : k;
    // batched packed ABI: B frames per execute; the round trip amortizes
    // over the batch like the Python bench's b64 path
    const long batch = json_int_or(meta, "batch", 1);
    auto in_specs = parse_specs(meta, "inputs");
    auto out_spec_list = parse_specs(meta, "outputs");

    std::vector<fpc::CreateOption> options;
    if (plugin.find("axon") != std::string::npos) options = AxonDefaultOptions();
    fpc::PjrtRuntime rt(plugin, options);
    std::printf("[serve] platform=%s devices=%d\n", rt.platform_name().c_str(),
                rt.num_devices());

    auto t0 = std::chrono::steady_clock::now();
    rt.Compile(fpc::read_file(model_dir + "/module.mlir"),
               fpc::read_file(model_dir + "/compile_options.pb"));
    auto t1 = std::chrono::steady_clock::now();
    std::printf("[serve] compiled %s (%zu outputs) in %.1fs\n",
                model_dir.c_str(), rt.num_outputs(),
                std::chrono::duration<double>(t1 - t0).count());

    std::vector<fpc::HostArray> out_specs;
    for (const auto& spec : out_spec_list) {
      out_specs.push_back(fpc::make_array(spec.shape, spec.type));
    }

    // inputs: image + keyframe feedback pair
    //   full:   (key_desc (K,D) f32, key_valid (K) pred)
    //   packed: (key_desc (N,D) f16, key_num s32 scalar)
    fpc::HostArray image = fpc::make_array(in_specs[0].shape, in_specs[0].type);
    fpc::HostArray key_desc = fpc::make_array(in_specs[1].shape, in_specs[1].type);
    fpc::HostArray key_valid = fpc::make_array(in_specs[2].shape, in_specs[2].type);

    // u8 bundles (export --input-dtype u8 [--gray]) take raw uint8 pixels
    // and normalize on device: the image upload shrinks 4x (12x with
    // --gray), which dominates batched serving on a bandwidth-bound link.
    // Frame sources still produce float [0,1]; quantization happens here
    // at staging time (exact for camera frames — they originate as u8).
    const bool u8_input = in_specs[0].type == PJRT_Buffer_Type_U8;
    const size_t frame_bytes = image.data.size() / batch;  // ABI bytes/frame
    const long frame_elems = h * w * c;
    std::vector<float> fframe(static_cast<size_t>(frame_elems));
    auto stage_frame = [&](const float* src, long b) {
      if (u8_input) {
        uint8_t* dst = image.data.data() + b * frame_bytes;
        for (long i = 0; i < frame_elems; ++i) {
          float v = src[i] * 255.0f + 0.5f;
          dst[i] = static_cast<uint8_t>(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
        }
      } else {
        std::memcpy(image.data.data() + b * frame_bytes, src,
                    sizeof(float) * frame_elems);
      }
    };

    std::unique_ptr<fpc::FrameSource> frame_source;
    if (!input_file.empty()) {
      std::string raw = fpc::read_file(input_file);
      const size_t f32_frame_bytes = sizeof(float) * frame_elems;
      if (raw.size() == f32_frame_bytes) {  // one frame: replicate per batch
        for (long b = 0; b < batch; ++b) {
          stage_frame(reinterpret_cast<const float*>(raw.data()), b);
        }
      } else if (raw.size() == f32_frame_bytes * batch) {
        for (long b = 0; b < batch; ++b) {
          stage_frame(
              reinterpret_cast<const float*>(raw.data()) + b * frame_elems, b);
        }
      } else {
        throw std::runtime_error("--input size mismatch: want " +
                                 std::to_string(f32_frame_bytes) + " or " +
                                 std::to_string(f32_frame_bytes * batch) +
                                 " bytes of raw f32 HWC");
      }
    } else {
      frame_source = fpc::OpenSource(source);
    }

    // per-frame host readback: everything a real consumer needs (keypoint
    // coordinates/scores + match indices); descriptors stay on device
    const std::vector<size_t> fetch_idx =
        packed ? std::vector<size_t>{0, 1, 2}    // num_valid, kp_packed, match
               : std::vector<size_t>{0, 1, 2, 3, 4, 5};  // y,x,score,valid,m,mv
    size_t fetch_bytes = 0;
    for (size_t i : fetch_idx) fetch_bytes += out_specs[i].data.size();
    std::printf("[serve] abi=%s top_n=%ld batch=%ld readback=%zu bytes/exec\n",
                packed ? "packed" : "full", top_n, batch, fetch_bytes);
    if (!packed && batch != 1) {
      // the full-ABI retire path counts keypoints/matches over fixed k and
      // would silently count padded frames; export_pjrt asserts batch==1
      // for abi=full — mirror that invariant at runtime
      std::fprintf(stderr,
                   "[serve] full ABI requires batch==1 (got %ld); "
                   "batched exports use --abi packed\n", batch);
      return 2;
    }

    // --pipeline takes a comma list ("1,2,4,8"): every depth runs in THIS
    // process, so the multi-minute remote compile is paid once per bundle
    // instead of once per sweep point.
    std::vector<int> depths;
    for (const char* p = pipeline.c_str(); *p != 0;) {
      char* end = nullptr;
      long v = std::strtol(p, &end, 10);
      if (end == p || (*end != 0 && *end != ',')) {
        // a malformed element must not silently truncate the sweep or fall
        // back to the default depth — the log would look complete
        std::fprintf(stderr,
                     "[serve] bad --pipeline value %s (want e.g. 1,2,4,8)\n",
                     pipeline.c_str());
        return 2;
      }
      depths.push_back(static_cast<int>(v));
      p = (*end == ',') ? end + 1 : end;
    }
    if (depths.empty()) depths.push_back(2);
    bool src_drained = false;
    for (size_t di = 0; di < depths.size(); ++di) {
    const int depth_raw = depths[di];
    if (src_drained) {
      std::string rest;
      for (size_t j = di; j < depths.size(); ++j)
        rest += (j > di ? "," : "") + std::to_string(depths[j]);
      std::printf("[serve] source drained; skipping remaining depths %s\n",
                  rest.c_str());
      break;
    }
    const int depth = depth_raw < 1 ? 1 : depth_raw;
    if (depths.size() > 1) std::printf("[serve] === pipeline depth %d ===\n", depth);
    long total_matches = 0;
    long steady_frames = 0;  // real (non-padding) frames past the keyframe
    int done = 0;
    // device-resident keyframe state (fed back without host round trips;
    // re-seeded per depth so every sweep point starts from the same state)
    fpc::DeviceBuffer key_desc_dev = rt.Upload(key_desc);
    fpc::DeviceBuffer key_valid_dev = rt.Upload(key_valid);

    // One frame in flight: uploaded + executed + fetches started, retire
    // (await) deferred so the next frame's round trips overlap.  The output
    // buffers must outlive the pending fetches.
    struct InFlight {
      int index = 0;
      long real = 0;  // staged real frames this execute (< batch when the
                      // source drained mid-batch and the tail is padding)
      std::vector<fpc::DeviceBuffer> outs;
      std::vector<fpc::PjrtRuntime::PendingFetch> fetches;
      std::chrono::steady_clock::time_point issued;
    };
    std::deque<InFlight> in_flight;

    auto retire = [&](InFlight& fl) {
      std::vector<fpc::HostArray> got;
      got.reserve(fl.fetches.size());
      for (auto& f : fl.fetches) got.push_back(rt.WaitFetch(f));
      auto s1 = std::chrono::steady_clock::now();
      long n_kp = 0, n_match = 0;
      if (packed) {
        for (long b = 0; b < fl.real; ++b) n_kp += got[0].s32()[b];
        const int32_t* mi = got[2].s32();
        for (long i = 0; i < fl.real * top_n; ++i) n_match += mi[i] >= 0;
      } else {
        // counting over fixed k with no fl.real masking assumes batch==1
        // (checked once at startup below)
        for (long i = 0; i < k; ++i) {
          n_kp += got[3].pred()[i] != 0;
          n_match += got[5].pred()[i] != 0;
        }
      }
      if (fl.index > 0) {
        total_matches += n_match;
        steady_frames += fl.real;
      }
      if (fl.index < 3 || fl.index + 1 == frames) {
        std::printf(
            "[serve] exec %3d: keypoints=%4ld matches=%4ld (latency %.2f ms)\n",
            fl.index, n_kp, n_match,
            1e3 * std::chrono::duration<double>(s1 - fl.issued).count());
      }
      done = fl.index + 1;
    };

    std::chrono::steady_clock::time_point steady_t0;
    bool exhausted = false;
    for (int f = 0; f < frames && !exhausted; ++f) {
      long staged = frame_source ? 0 : batch;
      for (long b = 0; frame_source && b < batch; ++b) {
        if (!frame_source->GetFrame(fframe.data(), static_cast<int>(h),
                                    static_cast<int>(w),
                                    static_cast<int>(c))) {
          std::printf("[serve] frame source exhausted after %d executes\n", f);
          exhausted = true;
          break;
        }
        stage_frame(fframe.data(), b);
        staged = b + 1;
      }
      if (exhausted) {
        if (staged == 0) break;
        // pad the tail with the last real frame so the partial batch still
        // executes; retire() counts only the `real` slots
        for (long b = staged; b < batch; ++b) {
          std::memcpy(image.data.data() + b * frame_bytes,
                      image.data.data() + (staged - 1) * frame_bytes,
                      frame_bytes);
        }
      }
      InFlight fl;
      fl.index = f;
      fl.real = staged;
      fl.issued = std::chrono::steady_clock::now();
      // Upload copies out of `image` before returning, so the single host
      // staging array is safely reused next iteration.
      fpc::DeviceBuffer image_dev = rt.Upload(image);
      fl.outs = rt.Execute({image_dev.get(), key_desc_dev.get(),
                            key_valid_dev.get()});
      for (size_t i : fetch_idx) {
        fl.fetches.push_back(rt.StartToHost(fl.outs[i], out_specs[i]));
      }

      if (f == 0) {
        // First frame becomes the keyframe — its descriptors (+ validity /
        // count) are fed back as device buffers (futures: later executes
        // chain on them without any host round trip; the reference copies
        // descriptors out per frame, superpoint.cc:98-152).  Retired
        // synchronously so the steady-state clock starts clean.  Batched
        // exports carry the feedback as dedicated (key_desc_out,
        // key_num_out) outputs because the per-frame arrays gained a batch
        // dimension.
        const size_t desc_i = packed ? (batch > 1 ? 4 : 3) : 6;
        const size_t num_i = packed ? (batch > 1 ? 5 : 0) : 3;
        key_desc_dev = std::move(fl.outs[desc_i]);
        // pending fetches still read some outs — retire first, then take
        // ownership of the validity/count buffer.
        retire(fl);
        key_valid_dev = std::move(fl.outs[num_i]);
        steady_t0 = std::chrono::steady_clock::now();
        continue;
      }
      in_flight.push_back(std::move(fl));
      while (static_cast<int>(in_flight.size()) >= depth) {
        retire(in_flight.front());
        in_flight.pop_front();
      }
    }
    while (!in_flight.empty()) {
      retire(in_flight.front());
      in_flight.pop_front();
    }
    if (done > 1) {
      double steady_s = std::chrono::duration<double>(
                            std::chrono::steady_clock::now() - steady_t0)
                            .count();
      std::printf(
          "[serve] steady-state: %.1f FPS (pipeline depth %d, batch %ld), "
          "mean matches/frame %.1f\n",
          steady_frames / steady_s, depth, batch,
          static_cast<double>(total_matches) / steady_frames);
    }
    src_drained = src_drained || exhausted;
    }  // depth sweep
  } catch (const std::exception& e) {
    std::fprintf(stderr, "[serve] FATAL: %s\n", e.what());
    return 1;
  }
  return 0;
}
