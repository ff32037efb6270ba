// Opaque-handle C API.
// Capability parity with reference runtime/core/api/wenet_api.h:27-105
// (init/free/reset/decode/get_result + nbest/timestamp/context knobs).
#ifndef WENET_TPU_API_WENET_API_H_
#define WENET_TPU_API_WENET_API_H_

#ifdef __cplusplus
extern "C" {
#endif

// model_dir contract: contains `units.txt` (symbol table) and
// `worker_cmd.txt` (one line: the JAX worker command, e.g.
// "python -m wenet_celoss_tpu.bin.runtime_worker --config train.yaml
//  --checkpoint final.ckpt").
void* wenet_init(const char* model_dir);
void wenet_free(void* decoder);
void wenet_reset(void* decoder);

// data: PCM16 bytes; last: 1 on the final chunk.
const char* wenet_decode(void* decoder, const char* data, int len,
                         int last);
const char* wenet_get_result(void* decoder);

void wenet_set_nbest(void* decoder, int n);
void wenet_set_timestamp(void* decoder, int flag);
void wenet_add_context(void* decoder, const char* word);
void wenet_set_context_score(void* decoder, float score);
void wenet_set_continuous_decoding(void* decoder, int flag);
void wenet_set_chunk_size(void* decoder, int chunk_size);

#ifdef __cplusplus
}
#endif

#endif  // WENET_TPU_API_WENET_API_H_
