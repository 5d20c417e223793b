// dlse_native — native host-runtime kernels for the TPU speech-enhancement
// framework: WAV decode/encode and batched random-crop assembly.
//
// The reference's host data path ran through libsndfile/torchaudio C code
// (dataloader/AudioDataset.py, dataloader/dataset.py); this library is the
// equivalent native layer here, exposed to Python via ctypes
// (dl_speech_enhancement_tpu/data/native.py) with a numpy fallback.
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV read

// Decodes PCM 8/16/24/32-bit and IEEE float32/64 WAV (incl. EXTENSIBLE).
// Returns 0 on success. Caller frees *out_data with dlse_free().
int dlse_read_wav(const char *path, float **out_data, int64_t *out_frames,
                  int32_t *out_channels, int32_t *out_sr) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  char hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  std::vector<uint8_t> data;
  bool have_fmt = false, have_data = false;
  char cid[4];
  uint32_t csize;
  while (fread(cid, 1, 4, f) == 4 && fread(&csize, 4, 1, f) == 1) {
    if (!memcmp(cid, "fmt ", 4)) {
      std::vector<uint8_t> fmt(csize);
      if (fread(fmt.data(), 1, csize, f) != csize) { fclose(f); return -3; }
      fmt_tag = fmt[0] | (fmt[1] << 8);
      channels = fmt[2] | (fmt[3] << 8);
      memcpy(&sr, &fmt[4], 4);
      bits = fmt[14] | (fmt[15] << 8);
      if (fmt_tag == 0xFFFE && csize >= 40) fmt_tag = fmt[24] | (fmt[25] << 8);
      have_fmt = true;
    } else if (!memcmp(cid, "data", 4)) {
      data.resize(csize);
      if (fread(data.data(), 1, csize, f) != csize) { fclose(f); return -3; }
      have_data = true;
    } else {
      fseek(f, csize + (csize & 1), SEEK_CUR);
      continue;
    }
    if (csize & 1) fseek(f, 1, SEEK_CUR);
  }
  fclose(f);
  if (!have_fmt || !have_data || channels == 0) return -4;
  // validate BEFORE the frames division: sub-byte formats (e.g. 4-bit
  // ADPCM) give bytes == 0 and the division would SIGFPE the process
  // instead of reaching the unsupported-format return below
  if (bits < 8 || bits % 8 != 0) return -6;

  const int bytes = bits / 8;
  const int64_t frames = (int64_t)data.size() / (bytes * channels);
  const int64_t n = frames * channels;
  float *out = (float *)malloc(sizeof(float) * (size_t)n);
  if (!out) return -5;

  const uint8_t *p = data.data();
  if (fmt_tag == 3 && bits == 32) {
    memcpy(out, p, sizeof(float) * (size_t)n);
  } else if (fmt_tag == 3 && bits == 64) {
    const double *d = (const double *)p;
    for (int64_t i = 0; i < n; ++i) out[i] = (float)d[i];
  } else if (fmt_tag == 1 && bits == 16) {
    const int16_t *d = (const int16_t *)p;
    for (int64_t i = 0; i < n; ++i) out[i] = d[i] * (1.0f / 32768.0f);
  } else if (fmt_tag == 1 && bits == 24) {
    for (int64_t i = 0; i < n; ++i) {
      int32_t v = p[3 * i] | (p[3 * i + 1] << 8) | (p[3 * i + 2] << 16);
      if (v & 0x800000) v -= 0x1000000;
      out[i] = v * (1.0f / 8388608.0f);
    }
  } else if (fmt_tag == 1 && bits == 32) {
    const int32_t *d = (const int32_t *)p;
    for (int64_t i = 0; i < n; ++i) out[i] = (float)(d[i] / 2147483648.0);
  } else if (fmt_tag == 1 && bits == 8) {
    for (int64_t i = 0; i < n; ++i) out[i] = (p[i] - 128) * (1.0f / 128.0f);
  } else {
    free(out);
    return -6;
  }
  *out_data = out;
  *out_frames = frames;
  *out_channels = channels;
  *out_sr = (int32_t)sr;
  return 0;
}

void dlse_free(float *p) { free(p); }

// ---------------------------------------------------------------- WAV write

// PCM16 writer (bin/test.py dumps PCM_16). data: (frames, channels) float32.
int dlse_write_wav(const char *path, const float *data, int64_t frames,
                   int32_t channels, int32_t sr) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = (uint32_t)(frames * channels * 2);
  const uint32_t riff = 36 + data_bytes;
  const uint16_t block = (uint16_t)(channels * 2);
  const uint32_t byte_rate = sr * block;
  const uint16_t fmt_tag = 1, bits = 16;
  const uint32_t fmt_size = 16;
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f); fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f); fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt_tag, 2, 1, f);
  uint16_t ch16 = (uint16_t)channels;
  fwrite(&ch16, 2, 1, f);
  fwrite(&sr, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
  fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
  const int64_t n = frames * channels;
  std::vector<int16_t> pcm((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    float v = data[i] * 32768.0f;
    v = v > 32767.0f ? 32767.0f : (v < -32768.0f ? -32768.0f : v);
    // round-half-to-even (IEEE default), bit-identical to np.round so the
    // native and pure-Python writers produce the same file
    pcm[(size_t)i] = (int16_t)nearbyintf(v);
  }
  fwrite(pcm.data(), 2, (size_t)n, f);
  fclose(f);
  return 0;
}

// ------------------------------------------------------- batch random crop

// Assemble a (batch, crop_len, channels) batch from `batch` source clips at
// the given start offsets — the collater hot loop without Python overhead.
// clips: array of pointers to (len_i, channels) float32 buffers.
void dlse_crop_batch(const float **clips, const int64_t *starts,
                     int32_t batch, int64_t crop_len, int32_t channels,
                     float *out) {
  const int64_t stride = crop_len * channels;
  for (int32_t b = 0; b < batch; ++b) {
    memcpy(out + b * stride, clips[b] + starts[b] * channels,
           sizeof(float) * (size_t)stride);
  }
}

}  // extern "C"
