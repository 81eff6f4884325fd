"""Large-scale training-data pipeline operators (beyond the reference's
surface; first-class per BASELINE.json): dedup, similarity search, text
analysis, multimodal columns."""

from fugue_spark.pipeline.dedup import (
    decontaminate,
    dedup_exact,
    dedup_near,
    minhash_lsh_pairs,
    minhash_lsh_pairs_against,
    minhash_signatures,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_verified_pairs,
)
from fugue_spark.pipeline.codecs import (
    decode_avi,
    decode_avi_stats,
    decode_jpeg,
    decode_jpeg_pixels,
    decode_png,
    decode_png_pixels,
    decode_wav,
    encode_avi_mjpeg,
    encode_jpeg,
    encode_png,
    encode_wav,
)
from fugue_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    as_media,
    extract_features,
    pack_avi_tiles,
    pack_jpeg_tiles,
    pack_wav,
    register_decoder,
    resample_audio,
    resize_images,
    sample_frames,
    video_frame_features,
    with_media_meta,
)
from fugue_spark.pipeline.rollup import time_rollup
from fugue_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    near_duplicates_by_embedding,
    near_duplicates_lsh,
    semantic_dedup,
)
from fugue_spark.pipeline.text import (
    assign_pack_bins,
    select_until_budget,
    select_until_budgets,
    mixture_report,
    chunk_documents,
    duplicate_spans,
    corpus_stats,
    ngram_overlap,
    ngram_topk,
    scrub_text,
    tfidf_doc_scores,
    with_fingerprint,
    winnowing_fingerprints,
    winnowing_pairs,
    with_gopher_flags,
    with_lang_id,
    with_quality_score,
    with_repetition_stats,
    with_token_stats,
    with_word_entropy,
)
from fugue_spark.pipeline.sessions import session_stats, sessionize  # noqa: E402,F401
from fugue_spark.pipeline.bloom import (  # noqa: E402,F401
    bloom_build,
    bloom_flag,
    bloom_merge,
    dedup_incremental,
)
from fugue_spark.pipeline.similarity import cosine_topk_ivf  # noqa: E402,F401
from fugue_spark.pipeline.similarity import (  # noqa: E402,F401
    PQCodebook,
    pq_encode,
    pq_topk,
    pq_train,
)
