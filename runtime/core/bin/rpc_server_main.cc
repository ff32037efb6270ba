// Streaming ASR RPC server entry point (reference
// runtime/core/bin/grpc_server_main.cc equivalent; transport is
// length-prefixed protobuf frames over TCP — see grpc/wenet_rpc.proto).
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <unordered_map>

#include "decoder/subprocess_asr_model.h"
#include "grpc/rpc_server.h"

using namespace wenet_tpu;

int main(int argc, char** argv) {
  int port = 10087;
  std::string symbol_table_path, worker_cmd;
  int chunk_size = 16;
  int max_connections = -1;
  int num_bins = 80;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--port") port = std::atoi(next().c_str());
    else if (a == "--symbol_table") symbol_table_path = next();
    else if (a == "--worker_cmd") worker_cmd = next();
    else if (a == "--chunk_size") chunk_size = std::atoi(next().c_str());
    else if (a == "--max_connections")
      max_connections = std::atoi(next().c_str());
    else if (a == "--num_bins") num_bins = std::atoi(next().c_str());
    else {
      std::fprintf(stderr, "unknown flag %s\n", a.c_str());
      return 1;
    }
  }
  auto symbol_table =
      std::make_shared<std::unordered_map<int, std::string>>();
  {
    std::ifstream in(symbol_table_path);
    std::string sym;
    int id;
    while (in >> sym >> id) (*symbol_table)[id] = sym;
  }
  std::vector<std::string> worker_argv;
  std::stringstream ss(worker_cmd);
  std::string tok;
  while (ss >> tok) worker_argv.push_back(tok);

  auto resource = std::make_shared<DecodeResource>();
  resource->model = std::make_shared<SubprocessAsrModel>(worker_argv);
  resource->symbol_table = symbol_table;
  resource->post_processor = std::make_shared<PostProcessor>();

  DecodeOptions opts;
  opts.chunk_size = chunk_size;
  rpc::RpcServer server(port, resource, opts, num_bins);
  std::fprintf(stderr, "rpc server listening on %d\n", port);
  server.Start(max_connections);
  return 0;
}
