// Native event-log engine: framed, CRC-checked episode-chunk records.
//
// Reference counterpart: the protobuf serialization layer (C++ libprotobuf
// behind the Python `event.proto` bindings) used by the reference's
// `event_log.py` (SURVEY.md §2a; reference mount empty that session).
// Format: see ../format.md — column-major per-episode chunks so the host
// sink serializes whole device-fetched arrays with zero per-step work.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). The Python
// twin (writer.py) produces byte-identical files; tests assert parity.
//
// Build: cc -O2 -shared -fPIC eventlog.cpp -o libeventlog.so  (see build.py)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x45505043;  // "CPPE" little-endian
constexpr uint32_t kVersion = 1;
constexpr uint32_t kKindEpisode = 1;
constexpr uint32_t kKindMetadata = 2;

// IEEE 802.3 CRC32 (zlib-compatible), table-driven.
uint32_t* crc_table() {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  return table;
}

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  uint32_t* t = crc_table();
  crc ^= 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i) crc = t[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

struct Writer {
  FILE* f = nullptr;
  std::vector<uint8_t> buf;  // payload staging for one record
};

void append(std::vector<uint8_t>& v, const void* p, size_t n) {
  const uint8_t* b = static_cast<const uint8_t*>(p);
  v.insert(v.end(), b, b + n);
}

template <typename T>
void append_scalar(std::vector<uint8_t>& v, T x) {
  append(v, &x, sizeof(T));  // little-endian on every supported target
}

int write_record(Writer* w, uint32_t kind) {
  uint64_t len = w->buf.size();
  uint32_t crc = crc32_update(0, w->buf.data(), w->buf.size());
  if (fwrite(&kind, 4, 1, w->f) != 1) return -1;
  if (fwrite(&len, 8, 1, w->f) != 1) return -1;
  if (len && fwrite(w->buf.data(), 1, len, w->f) != len) return -1;
  if (fwrite(&crc, 4, 1, w->f) != 1) return -1;
  w->buf.clear();
  return 0;
}

}  // namespace

extern "C" {

// Returns an opaque writer handle, or null on failure.
void* eventlog_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  uint32_t hdr[2] = {kMagic, kVersion};
  if (fwrite(hdr, 4, 2, f) != 2) {
    fclose(f);
    return nullptr;
  }
  Writer* w = new Writer();
  w->f = f;
  return w;
}

// Append-mode open: continues an existing log (header is only written
// for a fresh/empty file). Returns null on IO failure.
void* eventlog_open_append(const char* path) {
  FILE* f = fopen(path, "ab");
  if (!f) return nullptr;
  long pos = ftell(f);
  if (pos < 8) {
    uint32_t hdr[2] = {kMagic, kVersion};
    if (fwrite(hdr, 4, 2, f) != 2) {
      fclose(f);
      return nullptr;
    }
  }
  Writer* w = new Writer();
  w->f = f;
  return w;
}

int eventlog_write_metadata(void* handle, const char* json, uint32_t json_len) {
  Writer* w = static_cast<Writer*>(handle);
  append_scalar<uint32_t>(w->buf, json_len);
  append(w->buf, json, json_len);
  return write_record(w, kKindMetadata);
}

// Arrays are column-major per chunk: state[T*D], action[T*A], reward[T],
// done[T], frames[T*F] (frames may be null when frame_len == 0).
int eventlog_write_chunk(void* handle, uint64_t episode_id, uint32_t env_id,
                         uint32_t num_steps, uint32_t state_dim,
                         uint32_t action_dim, uint32_t frame_len,
                         const float* state, const float* action,
                         const float* reward, const uint8_t* done,
                         const uint8_t* frames) {
  Writer* w = static_cast<Writer*>(handle);
  append_scalar<uint64_t>(w->buf, episode_id);
  append_scalar<uint32_t>(w->buf, env_id);
  append_scalar<uint32_t>(w->buf, num_steps);
  append_scalar<uint32_t>(w->buf, state_dim);
  append_scalar<uint32_t>(w->buf, action_dim);
  append_scalar<uint32_t>(w->buf, frame_len);
  append(w->buf, state, sizeof(float) * num_steps * state_dim);
  append(w->buf, action, sizeof(float) * num_steps * action_dim);
  append(w->buf, reward, sizeof(float) * num_steps);
  append(w->buf, done, num_steps);
  if (frame_len) append(w->buf, frames, (size_t)num_steps * frame_len);
  return write_record(w, kKindEpisode);
}

int eventlog_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  int rc = fclose(w->f);
  delete w;
  return rc;
}

// --- reader -----------------------------------------------------------------
// Validates framing + CRC of every record; returns record count, or -1 on
// corruption / IO error. (Decoding payloads into arrays is done in Python,
// which memory-maps the file; the native layer owns integrity checking.)
int64_t eventlog_validate(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint32_t hdr[2];
  if (fread(hdr, 4, 2, f) != 2 || hdr[0] != kMagic || hdr[1] != kVersion) {
    fclose(f);
    return -1;
  }
  int64_t count = 0;
  std::vector<uint8_t> payload;
  for (;;) {
    uint32_t kind;
    size_t got = fread(&kind, 4, 1, f);
    if (got == 0) break;  // clean EOF
    uint64_t len;
    if (fread(&len, 8, 1, f) != 1) goto fail;
    payload.resize(len);
    if (len && fread(payload.data(), 1, len, f) != len) goto fail;
    uint32_t crc;
    if (fread(&crc, 4, 1, f) != 1) goto fail;
    if (crc != crc32_update(0, payload.data(), payload.size())) goto fail;
    if (kind != kKindEpisode && kind != kKindMetadata) goto fail;
    ++count;
  }
  fclose(f);
  return count;
fail:
  fclose(f);
  return -1;
}

// Per-env episode index: out_max[e] = highest episode_id seen for env e
// (unchanged where an env never appears — caller pre-fills with -1).
// Walks framing only (payload header fields), skipping array bytes with
// fseek — O(records), not O(bytes). Returns record count, or -1 on
// corruption / IO error. Resume seeding (writer.py::next_episode_ids)
// uses this instead of decoding every chunk in Python.
int64_t eventlog_episode_index(const char* path, int64_t* out_max,
                               uint32_t num_envs) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint32_t hdr[2];
  if (fread(hdr, 4, 2, f) != 2 || hdr[0] != kMagic || hdr[1] != kVersion) {
    fclose(f);
    return -1;
  }
  int64_t count = 0;
  for (;;) {
    uint32_t kind;
    if (fread(&kind, 4, 1, f) == 0) break;  // clean EOF
    uint64_t len;
    if (fread(&len, 8, 1, f) != 1) goto fail;
    if (kind == kKindEpisode) {
      if (len < 28) goto fail;
      uint64_t episode_id;
      uint32_t env_id;
      if (fread(&episode_id, 8, 1, f) != 1) goto fail;
      if (fread(&env_id, 4, 1, f) != 1) goto fail;
      if (env_id < num_envs &&
          (int64_t)episode_id > out_max[env_id]) {
        out_max[env_id] = (int64_t)episode_id;
      }
      if (fseek(f, (long)(len - 12 + 4), SEEK_CUR) != 0) goto fail;
    } else if (kind == kKindMetadata) {
      if (fseek(f, (long)(len + 4), SEEK_CUR) != 0) goto fail;
    } else {
      goto fail;
    }
    ++count;
  }
  fclose(f);
  return count;
fail:
  fclose(f);
  return -1;
}

}  // extern "C"
