/* Minimal libsndfile API subset for the reference aku build: WAV
 * (PCM16 mono) and RAW 16-bit reading only — the surface
 * aku/AudioReader.cc:92-260 actually uses.  Implemented in
 * sndfile_stub.cpp; a zero-egress build host has no libsndfile-dev. */
#ifndef AKU_STUB_SNDFILE_H
#define AKU_STUB_SNDFILE_H

#include <stdio.h>
#include <sys/types.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t sf_count_t;

typedef struct SNDFILE_tag SNDFILE;

typedef struct SF_INFO {
  sf_count_t frames;
  int samplerate;
  int channels;
  int format;
  int sections;
  int seekable;
} SF_INFO;

enum {
  SFM_READ = 0x10,
  SFM_WRITE = 0x20,

  SF_FORMAT_WAV = 0x010000,
  SF_FORMAT_RAW = 0x040000,
  SF_FORMAT_PCM_S8 = 0x0001,
  SF_FORMAT_PCM_16 = 0x0002,
  SF_FORMAT_PCM_24 = 0x0003,
  SF_FORMAT_PCM_32 = 0x0004,
  SF_FORMAT_PCM_U8 = 0x0005,
  SF_ENDIAN_FILE = 0x00000000,
  SF_ENDIAN_LITTLE = 0x10000000,
  SF_ENDIAN_BIG = 0x20000000,
  SF_FORMAT_SUBMASK = 0x0000FFFF,
  SF_FORMAT_TYPEMASK = 0x0FFF0000,
  SF_FORMAT_ENDMASK = 0x30000000
};

SNDFILE* sf_open(const char* path, int mode, SF_INFO* info);
SNDFILE* sf_open_fd(int fd, int mode, SF_INFO* info, int close_desc);
int sf_close(SNDFILE* f);
sf_count_t sf_read_short(SNDFILE* f, short* out, sf_count_t items);
sf_count_t sf_seek(SNDFILE* f, sf_count_t frames, int whence);
const char* sf_strerror(SNDFILE* f);

#ifdef __cplusplus
}
#endif

#endif /* AKU_STUB_SNDFILE_H */
