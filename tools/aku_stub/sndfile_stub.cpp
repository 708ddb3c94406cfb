// WAV (PCM16) + RAW reader implementing the libsndfile subset in
// sndfile.h.  Only what aku/AudioReader.cc uses: open by path or fd,
// mono PCM16 streams, sf_read_short, absolute sf_seek, close.
#include "sndfile.h"

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>

struct SNDFILE_tag {
  FILE* fp = nullptr;
  bool close_fp = true;
  long data_start = 0;       // byte offset of sample data
  sf_count_t frames = 0;     // total frames (or remaining unknown: -1)
  int channels = 1;
  bool big_endian = false;
  bool raw = false;
  std::string error;
};

static bool skip_bytes(FILE* fp, long n) {
  // pipe-safe skip: read and discard (stdin WAVs must parse without
  // seeking, like real libsndfile)
  char buf[4096];
  while (n > 0) {
    size_t want = n < (long)sizeof(buf) ? (size_t)n : sizeof(buf);
    size_t got = fread(buf, 1, want, fp);
    if (got == 0) return false;
    n -= (long)got;
  }
  return true;
}

static bool parse_wav(SNDFILE_tag* s, SF_INFO* info) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, s->fp) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  int channels = 1, rate = 16000, bits = 16;
  long pos = 12;
  // stop at the data chunk, stream positioned at its first sample
  for (;;) {
    unsigned char ch[8];
    if (fread(ch, 1, 8, s->fp) != 8) return false;
    pos += 8;
    uint32_t len = ch[4] | (ch[5] << 8) | (ch[6] << 16)
        | ((uint32_t)ch[7] << 24);
    if (memcmp(ch, "fmt ", 4) == 0) {
      unsigned char f[16];
      if (len < 16 || fread(f, 1, 16, s->fp) != 16) return false;
      pos += 16;
      int audio_fmt = f[0] | (f[1] << 8);
      channels = f[2] | (f[3] << 8);
      rate = f[4] | (f[5] << 8) | (f[6] << 16) | ((uint32_t)f[7] << 24);
      bits = f[14] | (f[15] << 8);
      if (audio_fmt != 1 || bits != 16) return false;  // PCM16 only
      if (len > 16) {
        if (!skip_bytes(s->fp, len - 16)) return false;
        pos += len - 16;
      }
    } else if (memcmp(ch, "data", 4) == 0) {
      s->data_start = pos;
      s->channels = channels;
      s->frames = (sf_count_t)len / 2 / channels;
      info->samplerate = rate;
      info->channels = channels;
      info->frames = s->frames;
      info->format = SF_FORMAT_WAV | SF_FORMAT_PCM_16;
      long here = ftell(s->fp);
      info->seekable = (here >= 0) ? 1 : 0;
      info->sections = 1;
      return true;
    } else {
      if (!skip_bytes(s->fp, len + (len & 1))) return false;
      pos += len + (len & 1);
    }
  }
}

static SNDFILE* open_common(SNDFILE_tag* s, SF_INFO* info) {
  if ((info->format & SF_FORMAT_TYPEMASK) == SF_FORMAT_RAW) {
    s->raw = true;
    s->big_endian =
        (info->format & SF_FORMAT_ENDMASK) == SF_ENDIAN_BIG;
    s->channels = info->channels > 0 ? info->channels : 1;
    long pos = ftell(s->fp);
    if (pos >= 0 && fseek(s->fp, 0, SEEK_END) == 0) {
      long end = ftell(s->fp);
      s->frames = (end - pos) / 2 / s->channels;
      fseek(s->fp, pos, SEEK_SET);
      info->seekable = 1;
    } else {
      s->frames = -1;
      info->seekable = 0;
    }
    s->data_start = pos >= 0 ? pos : 0;
    info->frames = s->frames;
    info->sections = 1;
    return s;
  }
  if (!parse_wav(s, info)) {
    if (s->close_fp && s->fp) fclose(s->fp);
    delete s;
    return nullptr;
  }
  return s;
}

extern "C" SNDFILE* sf_open(const char* path, int mode, SF_INFO* info) {
  if (mode != SFM_READ) return nullptr;
  FILE* fp = fopen(path, "rb");
  if (!fp) return nullptr;
  SNDFILE_tag* s = new SNDFILE_tag;
  s->fp = fp;
  s->close_fp = true;
  return open_common(s, info);
}

extern "C" SNDFILE* sf_open_fd(int fd, int mode, SF_INFO* info,
                               int close_desc) {
  if (mode != SFM_READ) return nullptr;
  FILE* fp = fdopen(fd, "rb");
  if (!fp) return nullptr;
  SNDFILE_tag* s = new SNDFILE_tag;
  s->fp = fp;
  s->close_fp = close_desc != 0;
  return open_common(s, info);
}

extern "C" int sf_close(SNDFILE* f) {
  if (!f) return 0;
  if (f->fp && f->close_fp) fclose(f->fp);
  delete f;
  return 0;
}

extern "C" sf_count_t sf_read_short(SNDFILE* f, short* out,
                                    sf_count_t items) {
  size_t got = fread(out, 2, (size_t)items, f->fp);
  if (f->big_endian || (f->raw && false)) {
    if (f->big_endian)
      for (size_t i = 0; i < got; ++i) {
        unsigned short v = (unsigned short)out[i];
        out[i] = (short)((v >> 8) | (v << 8));
      }
  }
  return (sf_count_t)got;
}

extern "C" sf_count_t sf_seek(SNDFILE* f, sf_count_t frames,
                              int whence) {
  if (whence != SEEK_SET) return -1;
  if (fseek(f->fp, f->data_start + frames * 2 * f->channels,
            SEEK_SET) != 0)
    return -1;
  return frames;
}

extern "C" const char* sf_strerror(SNDFILE* f) {
  return f && !f->error.empty() ? f->error.c_str() : "sndfile stub";
}
