"""Large-scale training-data pipeline operators (SURVEY.md §7 M5).

Beyond the reference's surface: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding cosine), similarity search over
embedding columns, text analysis (language-ID, quality, tokens,
fingerprints), and multimodal binary-column plumbing.
"""

from datalake_toolkit_spark.llm.text import (
    bigram_familiarity,
    with_fingerprints,
    with_language_id,
    chunk_documents,
    with_text_stats,
    word_shingles,
)
from datalake_toolkit_spark.llm.cluster import (
    connected_components,
    dedup_clusters,
    dedup_keep_canonical,
    semantic_dedup,
)
from datalake_toolkit_spark.llm.dedup import (
    dup_ngram_stats,
    exact_dedup,
    exact_dedup_groups,
    incremental_minhash_dedup,
    incremental_semantic_dedup,
    jaccard_pairs,
    minhash_band_keys,
    minhash_ledger_retention,
    minhash_near_dup_pairs,
    minhash_signature,
    set_similarity_join,
    simhash,
)
from datalake_toolkit_spark.llm.ann_index import IVFIndex
from datalake_toolkit_spark.llm.search import (
    PostingsIndex,
    bm25_topk,
    hybrid_search_indexed,
    keyword_search_topk,
    phrase_search,
    posting_lists,
    rrf_fuse,
)
from datalake_toolkit_spark.llm.similarity import (
    cosine_similarity_col,
    cosine_near_dup_pairs,
    ivf_topk,
    cosine_topk,
    pool_embeddings,
    embedding_norms,
    lsh_bucketed_topk,
    project_embeddings,
    projection_matrix,
)

__all__ = [
    "bigram_familiarity",
    "bm25_topk",
    "keyword_search_topk",
    "phrase_search",
    "posting_lists",
    "PostingsIndex",
    "rrf_fuse",
    "hybrid_search_indexed",
    "connected_components",
    "cosine_similarity_col",
    "cosine_topk",
    "embedding_norms",
    "dedup_clusters",
    "semantic_dedup",
    "dedup_keep_canonical",
    "dup_ngram_stats",
    "exact_dedup",
    "exact_dedup_groups",
    "incremental_minhash_dedup",
    "incremental_semantic_dedup",
    "jaccard_pairs",
    "IVFIndex",
    "ivf_topk",
    "lsh_bucketed_topk",
    "minhash_band_keys",
    "minhash_ledger_retention",
    "minhash_near_dup_pairs",
    "minhash_signature",
    "set_similarity_join",
    "pool_embeddings",
    "project_embeddings",
    "projection_matrix",
    "simhash",
    "with_fingerprints",
    "with_language_id",
    "chunk_documents",
    "with_text_stats",
    "word_shingles",
]

from datalake_toolkit_spark.llm.multimodal import sample_frames  # noqa: E402,F401
from datalake_toolkit_spark.llm.sample import (  # noqa: E402,F401
    shard_by_token_budget,
    split_train_eval,
    stratified_sample,
)
from datalake_toolkit_spark.llm.sample import pack_training_windows  # noqa: E402,F401
from datalake_toolkit_spark.llm.curation import (  # noqa: E402,F401
    decontaminate,
    decontaminate_indexed,
    mixture_sample,
    redact_pii,
    with_repetition_stats,
)
from datalake_toolkit_spark.llm.curation import with_rarity_scores  # noqa: E402,F401
from datalake_toolkit_spark.llm.curation import curate_corpus  # noqa: E402,F401
from datalake_toolkit_spark.llm.curation import with_boilerplate_stats  # noqa: E402,F401
from datalake_toolkit_spark.llm.sample import weighted_sample  # noqa: E402,F401
from datalake_toolkit_spark.llm.text import hashed_embeddings  # noqa: E402,F401
from datalake_toolkit_spark.llm.bpe import (  # noqa: E402,F401
    bpe_tokenize,
    train_bpe,
    word_frequencies,
)
from datalake_toolkit_spark.llm.text import tfidf_embeddings  # noqa: E402,F401
from datalake_toolkit_spark.llm.sync import (  # noqa: E402,F401
    latest_plane_pin,
    search_plane_snapshot,
    sync_cursor,
    sync_ivf_from_table,
    sync_postings_from_table,
    sync_search_plane,
)
