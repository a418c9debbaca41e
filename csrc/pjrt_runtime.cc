#include "pjrt_runtime.h"

#include <dlfcn.h>

#include <cstring>
#include <fstream>
#include <sstream>

namespace fpc {

namespace {
template <typename T>
T Init() {
  T args;
  std::memset(&args, 0, sizeof(T));
  args.struct_size = sizeof(T);
  return args;
}
}  // namespace

size_t element_bytes(PJRT_Buffer_Type type) {
  switch (type) {
    case PJRT_Buffer_Type_PRED:
    case PJRT_Buffer_Type_S8:
    case PJRT_Buffer_Type_U8:
      return 1;
    case PJRT_Buffer_Type_S16:
    case PJRT_Buffer_Type_U16:
    case PJRT_Buffer_Type_F16:
    case PJRT_Buffer_Type_BF16:
      return 2;
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32:
    case PJRT_Buffer_Type_F32:
      return 4;
    case PJRT_Buffer_Type_S64:
    case PJRT_Buffer_Type_U64:
    case PJRT_Buffer_Type_F64:
      return 8;
    default:
      throw std::runtime_error("unsupported PJRT buffer type");
  }
}

HostArray make_array(std::vector<int64_t> dims, PJRT_Buffer_Type type) {
  HostArray a;
  a.dims = std::move(dims);
  a.type = type;
  a.data.resize(a.num_elements() * element_bytes(type));
  return a;
}

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

void PjrtRuntime::Check(PJRT_Error* err, const char* what) const {
  if (err == nullptr) return;
  std::string message = "(no message)";
  if (api_ != nullptr) {
    auto margs = Init<PJRT_Error_Message_Args>();
    margs.error = err;
    api_->PJRT_Error_Message(&margs);
    message.assign(margs.message, margs.message_size);
    auto dargs = Init<PJRT_Error_Destroy_Args>();
    dargs.error = err;
    api_->PJRT_Error_Destroy(&dargs);
  }
  throw std::runtime_error(std::string(what) + ": " + message);
}

void PjrtRuntime::Await(PJRT_Event* event, const char* what) const {
  auto wargs = Init<PJRT_Event_Await_Args>();
  wargs.event = event;
  PJRT_Error* err = api_->PJRT_Event_Await(&wargs);
  auto dargs = Init<PJRT_Event_Destroy_Args>();
  dargs.event = event;
  api_->PJRT_Event_Destroy(&dargs);
  Check(err, what);
}

PjrtRuntime::PjrtRuntime(const std::string& plugin_path,
                         const std::vector<CreateOption>& options) {
  dl_handle_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (dl_handle_ == nullptr) {
    throw std::runtime_error("dlopen failed for " + plugin_path + ": " +
                             dlerror());
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(dl_handle_, "GetPjrtApi"));
  if (get_api == nullptr) {
    throw std::runtime_error("GetPjrtApi not found in " + plugin_path);
  }
  api_ = get_api();
  if (api_ == nullptr) throw std::runtime_error("GetPjrtApi returned null");

  auto init = Init<PJRT_Plugin_Initialize_Args>();
  Check(api_->PJRT_Plugin_Initialize(&init), "PJRT_Plugin_Initialize");

  std::vector<PJRT_NamedValue> named;
  named.reserve(options.size());
  for (const auto& opt : options) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = sizeof(PJRT_NamedValue);
    v.name = opt.name.c_str();
    v.name_size = opt.name.size();
    if (opt.is_string) {
      v.type = PJRT_NamedValue_kString;
      v.string_value = opt.string_value.c_str();
      v.value_size = opt.string_value.size();
    } else {
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = opt.int64_value;
      v.value_size = 1;
    }
    named.push_back(v);
  }

  auto create = Init<PJRT_Client_Create_Args>();
  create.create_options = named.data();
  create.num_options = named.size();
  Check(api_->PJRT_Client_Create(&create), "PJRT_Client_Create");
  client_ = create.client;

  auto dev = Init<PJRT_Client_AddressableDevices_Args>();
  dev.client = client_;
  Check(api_->PJRT_Client_AddressableDevices(&dev),
        "PJRT_Client_AddressableDevices");
  devices_.assign(dev.addressable_devices,
                  dev.addressable_devices + dev.num_addressable_devices);
  if (devices_.empty()) throw std::runtime_error("no addressable devices");
}

PjrtRuntime::~PjrtRuntime() {
  if (executable_ != nullptr) {
    auto args = Init<PJRT_LoadedExecutable_Destroy_Args>();
    args.executable = executable_;
    api_->PJRT_LoadedExecutable_Destroy(&args);
  }
  if (client_ != nullptr) {
    auto args = Init<PJRT_Client_Destroy_Args>();
    args.client = client_;
    api_->PJRT_Client_Destroy(&args);
  }
  if (dl_handle_ != nullptr) dlclose(dl_handle_);
}

std::string PjrtRuntime::platform_name() const {
  auto args = Init<PJRT_Client_PlatformName_Args>();
  args.client = client_;
  Check(api_->PJRT_Client_PlatformName(&args), "PJRT_Client_PlatformName");
  return std::string(args.platform_name, args.platform_name_size);
}

void PjrtRuntime::Compile(const std::string& mlir_bytes,
                          const std::string& options_bytes) {
  auto program = Init<PJRT_Program>();
  program.code = const_cast<char*>(mlir_bytes.data());
  program.code_size = mlir_bytes.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  auto args = Init<PJRT_Client_Compile_Args>();
  args.client = client_;
  args.program = &program;
  args.compile_options = options_bytes.data();
  args.compile_options_size = options_bytes.size();
  Check(api_->PJRT_Client_Compile(&args), "PJRT_Client_Compile");
  executable_ = args.executable;

  auto ge = Init<PJRT_LoadedExecutable_GetExecutable_Args>();
  ge.loaded_executable = executable_;
  Check(api_->PJRT_LoadedExecutable_GetExecutable(&ge),
        "PJRT_LoadedExecutable_GetExecutable");
  auto no = Init<PJRT_Executable_NumOutputs_Args>();
  no.executable = ge.executable;
  Check(api_->PJRT_Executable_NumOutputs(&no), "PJRT_Executable_NumOutputs");
  num_outputs_ = no.num_outputs;
  auto ed = Init<PJRT_Executable_Destroy_Args>();
  ed.executable = ge.executable;
  api_->PJRT_Executable_Destroy(&ed);
}

void DeviceBuffer::reset() {
  if (buf_ != nullptr && api_ != nullptr) {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = sizeof(d);
    d.buffer = buf_;
    api_->PJRT_Buffer_Destroy(&d);
  }
  buf_ = nullptr;
}

DeviceBuffer PjrtRuntime::Upload(const HostArray& in) {
  auto args = Init<PJRT_Client_BufferFromHostBuffer_Args>();
  args.client = client_;
  args.data = in.data.data();
  args.type = in.type;
  args.dims = in.dims.data();
  args.num_dims = in.dims.size();
  // OnlyDuringCall: the copy out of `in` completes before the call returns,
  // so no completion await (a network round trip on relayed plugins).
  args.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
  args.device = devices_[0];
  Check(api_->PJRT_Client_BufferFromHostBuffer(&args),
        "PJRT_Client_BufferFromHostBuffer");
  if (args.done_with_host_buffer != nullptr) {
    auto d = Init<PJRT_Event_Destroy_Args>();
    d.event = args.done_with_host_buffer;
    api_->PJRT_Event_Destroy(&d);
  }
  return DeviceBuffer(api_, args.buffer);
}

std::vector<DeviceBuffer> PjrtRuntime::Execute(
    const std::vector<PJRT_Buffer*>& arg_buffers) {
  if (executable_ == nullptr) throw std::runtime_error("Compile first");

  auto options = Init<PJRT_ExecuteOptions>();
  std::vector<PJRT_Buffer*> outputs(num_outputs_, nullptr);
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer* const* arg_list = arg_buffers.data();

  auto args = Init<PJRT_LoadedExecutable_Execute_Args>();
  args.executable = executable_;
  args.options = &options;
  args.argument_lists = &arg_list;
  args.num_devices = 1;
  args.num_args = arg_buffers.size();
  args.output_lists = &output_list;
  args.device_complete_events = nullptr;  // completion observed via ToHost
  Check(api_->PJRT_LoadedExecutable_Execute(&args),
        "PJRT_LoadedExecutable_Execute");

  std::vector<DeviceBuffer> result;
  result.reserve(num_outputs_);
  for (auto* b : outputs) result.emplace_back(api_, b);
  return result;
}

HostArray PjrtRuntime::ToHost(const DeviceBuffer& buf, const HostArray& spec) {
  PendingFetch f = StartToHost(buf, spec);
  return WaitFetch(f);
}

PjrtRuntime::PendingFetch PjrtRuntime::StartToHost(const DeviceBuffer& buf,
                                                   const HostArray& spec) {
  PendingFetch f;
  f.host = spec;
  f.host.data.resize(f.host.num_elements() * element_bytes(f.host.type));
  auto th = Init<PJRT_Buffer_ToHostBuffer_Args>();
  th.src = buf.get();
  th.dst = f.host.data.data();
  th.dst_size = f.host.data.size();
  Check(api_->PJRT_Buffer_ToHostBuffer(&th), "PJRT_Buffer_ToHostBuffer");
  f.event = th.event;
  return f;
}

HostArray PjrtRuntime::WaitFetch(PendingFetch& fetch) {
  if (fetch.event != nullptr) {
    Await(fetch.event, "to host");  // Await destroys the event
    fetch.event = nullptr;
  }
  return std::move(fetch.host);
}

std::vector<HostArray> PjrtRuntime::ExecuteHost(
    const std::vector<HostArray>& inputs,
    const std::vector<HostArray>& out_specs) {
  if (out_specs.size() != num_outputs_) {
    throw std::runtime_error("out_specs size mismatch: expected " +
                             std::to_string(num_outputs_));
  }
  std::vector<DeviceBuffer> args;
  std::vector<PJRT_Buffer*> raw;
  for (const auto& in : inputs) {
    args.push_back(Upload(in));
    raw.push_back(args.back().get());
  }
  auto outs = Execute(raw);
  std::vector<HostArray> results;
  for (size_t i = 0; i < outs.size(); ++i) {
    results.push_back(ToHost(outs[i], out_specs[i]));
  }
  return results;
}

}  // namespace fpc
