// Native serving runtime over the PJRT C API.
//
// TPU-native counterpart of the reference's LibTorch/TensorRT C++ engine
// (/root/reference/cpp/src/superpoint.{h,cc}): instead of torch::jit::load +
// trtorch::CompileGraph, we dlopen a PJRT plugin (libtpu / libaxon / any
// conforming plugin), compile the StableHLO module exported by
// `SuperPointFrontend.export_pjrt`, and run the fused
// detect+describe+match program with zero framework dependencies.
//
// Performance notes (tuned against a relayed plugin where every await is a
// network round trip): inputs upload with ImmutableOnlyDuringCall semantics
// (no completion await), outputs stay device-resident until explicitly
// fetched, and device buffers can be fed back as next-step inputs without a
// host round trip (keyframe feedback).

#ifndef FPC_PJRT_RUNTIME_H_
#define FPC_PJRT_RUNTIME_H_

#include <cstdint>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace fpc {

struct HostArray {
  std::vector<int64_t> dims;
  PJRT_Buffer_Type type = PJRT_Buffer_Type_F32;
  std::vector<uint8_t> data;  // dense, major-to-minor

  size_t num_elements() const {
    size_t n = 1;
    for (auto d : dims) n *= static_cast<size_t>(d);
    return n;
  }
  float* f32() { return reinterpret_cast<float*>(data.data()); }
  const float* f32() const { return reinterpret_cast<const float*>(data.data()); }
  int32_t* s32() { return reinterpret_cast<int32_t*>(data.data()); }
  const uint8_t* pred() const { return data.data(); }
};

size_t element_bytes(PJRT_Buffer_Type type);
HostArray make_array(std::vector<int64_t> dims, PJRT_Buffer_Type type);

// A client create option (PJRT_NamedValue): string or int64.
struct CreateOption {
  std::string name;
  bool is_string = false;
  std::string string_value;
  int64_t int64_value = 0;

  static CreateOption Str(std::string n, std::string v) {
    CreateOption o; o.name = std::move(n); o.is_string = true;
    o.string_value = std::move(v); return o;
  }
  static CreateOption Int(std::string n, int64_t v) {
    CreateOption o; o.name = std::move(n); o.int64_value = v; return o;
  }
};

class PjrtRuntime;

// Owning handle to a device buffer.
class DeviceBuffer {
 public:
  DeviceBuffer() = default;
  DeviceBuffer(const PJRT_Api* api, PJRT_Buffer* buf) : api_(api), buf_(buf) {}
  DeviceBuffer(DeviceBuffer&& o) noexcept { *this = std::move(o); }
  DeviceBuffer& operator=(DeviceBuffer&& o) noexcept {
    reset();
    api_ = o.api_;
    buf_ = o.buf_;
    o.buf_ = nullptr;
    return *this;
  }
  DeviceBuffer(const DeviceBuffer&) = delete;
  DeviceBuffer& operator=(const DeviceBuffer&) = delete;
  ~DeviceBuffer() { reset(); }

  PJRT_Buffer* get() const { return buf_; }
  explicit operator bool() const { return buf_ != nullptr; }
  void reset();

 private:
  const PJRT_Api* api_ = nullptr;
  PJRT_Buffer* buf_ = nullptr;
};

// RAII handle for one loaded plugin + client.
class PjrtRuntime {
 public:
  // `plugin_path`: shared object exporting GetPjrtApi().  `options` are
  // passed as PJRT_NamedValue create options (plugin-specific; e.g. the
  // axon relay plugin requires topology/session_id/... — see
  // AxonDefaultOptions in superpoint_serve.cc).
  explicit PjrtRuntime(const std::string& plugin_path,
                       const std::vector<CreateOption>& options = {});
  ~PjrtRuntime();
  PjrtRuntime(const PjrtRuntime&) = delete;
  PjrtRuntime& operator=(const PjrtRuntime&) = delete;

  std::string platform_name() const;
  int num_devices() const { return static_cast<int>(devices_.size()); }

  // Compile an "mlir"-format program (StableHLO bytecode or text) with a
  // serialized CompileOptionsProto.
  void Compile(const std::string& mlir_bytes, const std::string& options_bytes);
  size_t num_outputs() const { return num_outputs_; }

  // Host -> device (synchronous copy; safe to reuse `in` afterwards).
  DeviceBuffer Upload(const HostArray& in);

  // Execute on device 0 over device-resident inputs; returns device-resident
  // outputs (fetch with ToHost, or feed back into the next Execute).
  std::vector<DeviceBuffer> Execute(const std::vector<PJRT_Buffer*>& args);

  // A device->host copy in flight: started, not yet awaited.  Destination
  // storage lives inside `host` (stable across moves); the SOURCE device
  // buffer must stay alive until WaitFetch returns.
  struct PendingFetch {
    HostArray host;
    PJRT_Event* event = nullptr;
  };

  // Device -> host into a spec-shaped array (StartToHost + WaitFetch).
  HostArray ToHost(const DeviceBuffer& buf, const HostArray& spec);

  // Begin an async device->host copy.  On a relayed plugin the await is a
  // network round trip, so starting several fetches (or the next frame's
  // upload+execute) before awaiting overlaps those round trips — see the
  // pipelined loop in superpoint_serve.cc.
  PendingFetch StartToHost(const DeviceBuffer& buf, const HostArray& spec);

  // Await the copy, release the event, return the filled array.
  HostArray WaitFetch(PendingFetch& fetch);

  // Convenience: full host->device->host round trip.
  std::vector<HostArray> ExecuteHost(const std::vector<HostArray>& inputs,
                                     const std::vector<HostArray>& out_specs);

  const PJRT_Api* api() const { return api_; }

 private:
  void Check(PJRT_Error* err, const char* what) const;
  void Await(PJRT_Event* event, const char* what) const;

  void* dl_handle_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  std::vector<PJRT_Device*> devices_;
  PJRT_LoadedExecutable* executable_ = nullptr;
  size_t num_outputs_ = 0;
};

std::string read_file(const std::string& path);

}  // namespace fpc

#endif  // FPC_PJRT_RUNTIME_H_
