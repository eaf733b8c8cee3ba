/* Standalone C host for the flat C API — proves the FFI contract from a
 * NON-Python process (the reference roadmap's Swift/Go/Rust scenario):
 * libparakeet_c.so must bring up its own CPython, keep the GIL honest,
 * and round-trip handles/strings. Compiled and run by
 * tests/test_capi.py::test_standalone_c_host. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "parakeet.h"

int main(void) {
  /* tiny random-weight config on CPU: compiles in seconds */
  int64_t h = parakeet_create(
      "test-tiny", NULL, NULL,
      "{\"device\":\"cpu\",\"decoder\":\"ctc\",\"timestamps\":true}");
  if (h == 0) {
    fprintf(stderr, "create failed: %s\n", parakeet_last_error());
    return 1;
  }

  /* error path: bad model must fail with a message, not crash */
  int64_t bad = parakeet_create("no-such-model", NULL, NULL, NULL);
  if (bad != 0 || strstr(parakeet_last_error(), "no-such-model") == NULL) {
    fprintf(stderr, "error path broken: h=%lld err=%s\n", (long long)bad,
            parakeet_last_error());
    return 1;
  }

  /* 0.75 s of 440 Hz at 16 kHz */
  enum { N = 12000 };
  float *pcm = (float *)malloc(sizeof(float) * N);
  for (int i = 0; i < N; i++) {
    pcm[i] = 0.4f * (float)sin(2.0 * 3.14159265358979 * 440.0 * i / 16000.0);
  }
  char *res = parakeet_transcribe_pcm(h, pcm, N, 16000);
  if (res == NULL) {
    fprintf(stderr, "transcribe_pcm failed: %s\n", parakeet_last_error());
    free(pcm);
    return 1;
  }
  printf("RESULT %s\n", res);
  parakeet_free_string(res);

  /* s16 overload through the same pipeline */
  int16_t *pcm16 = (int16_t *)malloc(sizeof(int16_t) * N);
  for (int i = 0; i < N; i++) {
    pcm16[i] = (int16_t)(pcm[i] * 32767.0f);
  }
  char *res16 = parakeet_transcribe_pcm_s16(h, pcm16, N, 16000);
  if (res16 == NULL) {
    fprintf(stderr, "transcribe_pcm_s16 failed: %s\n", parakeet_last_error());
    free(pcm);
    free(pcm16);
    return 1;
  }
  printf("RESULT16 %s\n", res16);
  parakeet_free_string(res16);

  /* streaming surface from the embedded host: feed two chunks, read the
   * accumulated state, reset */
  int64_t sh = parakeet_stream_create("test-tiny-stream", NULL, NULL,
                                      "{\"seed\": 3}");
  if (sh == 0) {
    fprintf(stderr, "stream_create failed: %s\n", parakeet_last_error());
    free(pcm);
    free(pcm16);
    return 1;
  }
  for (int c = 0; c < 2; c++) {
    char *sres = parakeet_stream_feed(sh, pcm + c * 3200, 3200);
    if (sres == NULL) {
      fprintf(stderr, "stream_feed failed: %s\n", parakeet_last_error());
      free(pcm);
      free(pcm16);
      return 1;
    }
    parakeet_free_string(sres);
  }
  char *stext = parakeet_stream_text(sh);
  if (stext == NULL) {
    fprintf(stderr, "stream_text failed: %s\n", parakeet_last_error());
    free(pcm);
    free(pcm16);
    return 1;
  }
  printf("STREAM %s\n", stext);
  parakeet_free_string(stext);
  parakeet_stream_reset(sh);
  parakeet_destroy(sh);

  char *ver = parakeet_version();
  if (ver == NULL) {
    fprintf(stderr, "version failed: %s\n", parakeet_last_error());
    free(pcm);
    free(pcm16);
    return 1;
  }
  printf("VERSION %s\n", ver);
  parakeet_free_string(ver);

  parakeet_destroy(h);
  parakeet_destroy(h); /* idempotent */
  free(pcm);
  free(pcm16);
  printf("OK\n");
  return 0;
}
