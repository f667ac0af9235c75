/* Full pipeline example for the needle-tpu C API: discover video files,
 * analyze them, then search for openings/endings. */
#include <stdio.h>

#include "../needle_tpu.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <path> [path...]\n", argv[0]);
    return 1;
  }

  NeedleError err;
  const char *const *videos = NULL;
  size_t num_videos = 0;

  err = needle_util_find_video_files((const char *const *)(argv + 1),
                                     (size_t)(argc - 1), /*full=*/true,
                                     /*audio=*/true, &videos, &num_videos);
  if (err != NeedleError_Ok) {
    fprintf(stderr, "failed to find videos: %s\n", needle_error_to_str(err));
    return 1;
  }
  printf("found %zu videos\n", num_videos);

  NeedleAudioAnalyzer *analyzer = NULL;
  const NeedleAudioComparator *comparator = NULL;

  err = needle_audio_analyzer_new_default(videos, num_videos, &analyzer);
  if (err != NeedleError_Ok) goto fail;

  err = needle_audio_analyzer_run(analyzer, 0.3f, /*persist=*/true,
                                  /*threading=*/true);
  if (err != NeedleError_Ok) goto fail;

  err = needle_audio_comparator_new_default(videos, num_videos, &comparator);
  if (err != NeedleError_Ok) goto fail;

  err = needle_audio_comparator_run(comparator, /*analyze=*/false,
                                    /*display=*/true, /*use_skip_files=*/false,
                                    /*write_skip_files=*/true,
                                    /*threading=*/true);
  if (err != NeedleError_Ok) goto fail;

  needle_audio_analyzer_free(analyzer);
  needle_audio_comparator_free(comparator);
  needle_util_video_files_free(videos, num_videos);
  return 0;

fail:
  fprintf(stderr, "error: %s\n", needle_error_to_str(err));
  needle_audio_analyzer_free(analyzer);
  needle_audio_comparator_free(comparator);
  needle_util_video_files_free(videos, num_videos);
  return 1;
}
