/* Comparator-only example for the needle-tpu C API (expects .needle.dat
 * files to already exist next to the videos, e.g. from the analyzer
 * example). */
#include <stdio.h>

#include "../needle_tpu.h"

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <video1> <video2> [video...]\n", argv[0]);
    return 1;
  }

  NeedleError err;
  const NeedleAudioComparator *comparator = NULL;

  err = needle_audio_comparator_new_default(
      (const char *const *)(argv + 1), (size_t)(argc - 1), &comparator);
  if (err != NeedleError_Ok) {
    fprintf(stderr, "failed to create comparator: %s\n",
            needle_error_to_str(err));
    return 1;
  }

  err = needle_audio_comparator_run(comparator, /*analyze=*/false,
                                    /*display=*/true, /*use_skip_files=*/false,
                                    /*write_skip_files=*/true,
                                    /*threading=*/true);
  if (err != NeedleError_Ok) {
    fprintf(stderr, "failed to run comparator: %s\n", needle_error_to_str(err));
    needle_audio_comparator_free(comparator);
    return 1;
  }

  needle_audio_comparator_free(comparator);
  return 0;
}
