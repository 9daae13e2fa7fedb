"""raydedup — a Ray-Data-native near-duplicate detection & clustering engine.

A from-scratch rebuild of the query/data-processing capabilities of
oduwsdl/off-topic-memento-toolkit (OTMT, ``/root/reference``) expressed as
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages, actor
pools for stateful signature computation, LSH band-hash ``groupby`` shuffles
for candidate generation, union-find / label-propagation clustering, and
per-partition checkpoint lineage for resumable execution.

Layout:
    raydedup.config       frozen DedupConfig (shingle/signature/threshold constants)
    raydedup.textnorm     tokenizer, Porter stemmer, stopwords, shingling
    raydedup.stages       map_batches stages (signatures, measures, text stats, ...)
    raydedup.sources      readers (parquet transcripts, documents, embeddings)
    raydedup.functions    pure vectorized kernels (simhash, minhash, jaccard, ...)
    raydedup.pipelines    end-to-end DAGs (near-dup, off-topic, storytelling chain)
    raydedup.state        checkpoint/lineage manifests, union-find
"""

from raydedup.config import DedupConfig, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["DedupConfig", "DEFAULT_CONFIG", "__version__"]
