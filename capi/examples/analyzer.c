/* Analyzer-only example for the needle-tpu C API. */
#include <stdio.h>

#include "../needle_tpu.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <video> [video...]\n", argv[0]);
    return 1;
  }

  NeedleError err;
  NeedleAudioAnalyzer *analyzer = NULL;

  err = needle_audio_analyzer_new_default(
      (const char *const *)(argv + 1), (size_t)(argc - 1), &analyzer);
  if (err != NeedleError_Ok) {
    fprintf(stderr, "failed to create analyzer: %s\n", needle_error_to_str(err));
    return 1;
  }

  needle_audio_analyzer_print_paths(analyzer);

  err = needle_audio_analyzer_run(analyzer, 0.3f, /*persist=*/true,
                                  /*threading=*/true);
  if (err != NeedleError_Ok) {
    fprintf(stderr, "failed to run analyzer: %s\n", needle_error_to_str(err));
    needle_audio_analyzer_free(analyzer);
    return 1;
  }

  printf("analyze OK\n");
  needle_audio_analyzer_free(analyzer);
  return 0;
}
