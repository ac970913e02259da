"""Training-data pipeline operators over document/embedding tables.

These are first-class engine components beyond the reference's extraction
surface: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard),
similarity search (brute-force + LSH-bucketed cosine), text analysis
(language-ID, quality, token counts, fingerprints), and multimodal column
plumbing. All are DataFrame programs (JVM-side expressions wherever
possible; Arrow-vectorized UDFs only where built-ins can't express the
semantics).
"""

from .dedup import (exact_duplicates, minhash_signatures, lsh_candidate_pairs,
                    minhash_duplicates, ngram_jaccard_pairs, shingle_rows,
                    simhash64, simhash_duplicates)
from .dedup import shingle_hash_rows
from .dedup import (dedup_keep_one, dedup_against_corpus, fuzzy_dedup,
                    fuzzy_dedup_against_corpus, remove_duplicate_ngrams,
                    cdc_chunks, cdc_duplicate_chunks,
                    cdc_dedup_rewrite,
                    duplicate_clusters)
from .similarity import (cosine_topk, embedding_near_duplicates, knn_join,
                         lsh_bucketed_topk)
from .textstats import (add_text_stats, bm25_topk, bpe_token_counts,
                        bpe_train, char_entropy, fingerprint,
                        language_id, pmi_collocations, tfidf_topk)
from .sketches import (cms_build, cms_merge, cms_query, hll_count_distinct,
                       hll_estimate, hll_merge, hll_registers, qhist_build,
                       qhist_merge, qhist_quantiles)
from .statsops import group_quantiles, key_skew
from .corpusops import (classifier_score, nb_train_quality_classifier,
                        snapshot_diff)
from .urlops import (anchor_corpus, crawl_schedule, curate_web,
                     parse_robots,
                     parse_sitemaps, robots_filter, sitemap_staleness)
from .htmlops import html_tables, html_table_stats

__all__ = [
    "exact_duplicates", "minhash_signatures", "lsh_candidate_pairs",
    "minhash_duplicates", "ngram_jaccard_pairs", "shingle_rows",
    "shingle_hash_rows", "simhash64", "simhash_duplicates", "cosine_topk",
    "embedding_near_duplicates", "knn_join", "lsh_bucketed_topk",
    "add_text_stats", "language_id", "fingerprint",
    "dedup_keep_one", "dedup_against_corpus", "fuzzy_dedup",
    "fuzzy_dedup_against_corpus", "remove_duplicate_ngrams",
    "cdc_chunks", "cdc_duplicate_chunks", "cdc_dedup_rewrite",
    "duplicate_clusters",
    "bm25_topk", "tfidf_topk", "pmi_collocations", "char_entropy",
    "bpe_train", "bpe_token_counts",
    "hll_registers", "hll_merge", "hll_estimate", "hll_count_distinct",
    "cms_build", "cms_merge", "cms_query", "group_quantiles", "key_skew",
    "qhist_build", "qhist_merge", "qhist_quantiles",
    "nb_train_quality_classifier", "classifier_score", "snapshot_diff",
    "anchor_corpus",
    "crawl_schedule",
    "curate_web",
    "parse_robots",
    "parse_sitemaps",
    "robots_filter",
    "sitemap_staleness",
    "html_tables",
    "html_table_stats",
]
