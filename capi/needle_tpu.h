/* needle-tpu C API.
 *
 * Drop-in C surface matching the reference's needle-capi header
 * (reference: needle-capi/needle.h, generated from needle-capi/src/lib.rs).
 * The implementation is entirely different: this library embeds a Python
 * interpreter and drives the needle_tpu JAX/TPU engines, instead of
 * wrapping a Rust core.
 *
 * Thread-safety: every call acquires the embedded interpreter's GIL; the
 * library may be called from any thread. The first call initializes the
 * interpreter (and the JAX backend lazily on first run), which can take a
 * few seconds.
 *
 * Set NEEDLE_TPU_PYTHON_ROOT to override where the needle_tpu package is
 * found (defaults to the directory containing this shared library, then its
 * parent — the repo layout).
 */

#ifndef NEEDLE_TPU_H
#define NEEDLE_TPU_H

#include <stdarg.h>
#include <stdbool.h>
#include <stdint.h>
#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Error codes (superset of the library's Python exceptions; matches the
 * reference C enum's variants and ordering). */
typedef enum NeedleError {
  NeedleError_Ok = 0,
  NeedleError_InvalidUtf8String,
  NeedleError_NullArgument,
  NeedleError_InvalidArgument,
  NeedleError_FrameHashDataNotFound,
  NeedleError_FrameHashDataInvalidVersion,
  NeedleError_InvalidFrameHashData,
  NeedleError_ComparatorMinimumPaths,
  NeedleError_AnalyzerInvalidHashPeriod,
  NeedleError_AnalyzerInvalidHashDuration,
  NeedleError_IOError,
  NeedleError_Unknown,
} NeedleError;

/* Opaque handles. */
typedef struct FrameHashes FrameHashes;
typedef struct NeedleAudioAnalyzer NeedleAudioAnalyzer;
typedef struct NeedleAudioComparator NeedleAudioComparator;

/* String form of an error code. Never returns NULL. */
const char *needle_error_to_str(enum NeedleError error);

/* Scan paths (files or directories) for valid video files. The returned
 * list must be freed with needle_util_video_files_free. */
enum NeedleError needle_util_find_video_files(const char *const *paths,
                                              size_t num_paths,
                                              bool full,
                                              bool audio,
                                              const char *const **videos,
                                              size_t *num_videos);

void needle_util_video_files_free(const char *const *videos, size_t num_videos);

/* --- Analyzer ---------------------------------------------------------- */

enum NeedleError needle_audio_analyzer_new_default(const char *const *paths,
                                                   size_t num_paths,
                                                   struct NeedleAudioAnalyzer **output);

enum NeedleError needle_audio_analyzer_new(const char *const *paths,
                                           size_t num_paths,
                                           float opening_search_percentage,
                                           float ending_search_percentage,
                                           bool include_endings,
                                           bool threaded_decoding,
                                           bool force,
                                           struct NeedleAudioAnalyzer **output);

/* Frame hashes for the video at `index` from the most recent run. The
 * pointer is owned by the analyzer and valid until the analyzer is freed
 * or run again. */
enum NeedleError needle_audio_analyzer_get_frame_hashes(
    const struct NeedleAudioAnalyzer *analyzer,
    size_t index,
    const struct FrameHashes **output);

void needle_audio_analyzer_free(const struct NeedleAudioAnalyzer *analyzer);

void needle_audio_analyzer_print_paths(const struct NeedleAudioAnalyzer *analyzer);

enum NeedleError needle_audio_analyzer_run(struct NeedleAudioAnalyzer *analyzer,
                                           float hash_duration,
                                           bool persist,
                                           bool threading);

/* --- Comparator -------------------------------------------------------- */

enum NeedleError needle_audio_comparator_new_default(
    const char *const *paths,
    size_t num_paths,
    const struct NeedleAudioComparator **output);

enum NeedleError needle_audio_comparator_new(const char *const *paths,
                                             size_t num_paths,
                                             bool include_endings,
                                             uint16_t hash_match_threshold,
                                             uint16_t min_opening_duration,
                                             uint16_t min_ending_duration,
                                             float time_padding,
                                             const struct NeedleAudioComparator **output);

void needle_audio_comparator_free(const struct NeedleAudioComparator *comparator);

enum NeedleError needle_audio_comparator_run(const struct NeedleAudioComparator *comparator,
                                             bool analyze,
                                             bool display,
                                             bool use_skip_files,
                                             bool write_skip_files,
                                             bool threading);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* NEEDLE_TPU_H */
