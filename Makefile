# Published training/eval configs — the exact flag sets of the reference
# Makefile:6-34, minus only the slurm wrapper (`run_py_job.sh -e ... -p
# cpu[-markov] -c N -s SCRIPT --` becomes `$(PY) SCRIPT`; the wrapper's
# core-count/partition options have no TPU equivalent, `--workers` is
# kept verbatim).
#
# Annotated deltas from the reference (everything else is verbatim):
#  * eval targets name the reference's `.pth.tar` artifacts; checkpoints
#    trained by THIS repo are written as `{name}_{epoch}.ckpt`
#    (icd_tpu/checkpoint.py) — pass the `.ckpt` name when evaluating or
#    resuming those. `load_checkpoint` converts `.pth.tar` transparently.
#  * `clean` removes `slurm-*` in the reference; no slurm here, so it is
#    a no-op guard.

PY ?= python

.PHONY: attention baseline attention_glove baseline_glove attention_bert \
	baseline_eval baseline_glove_eval attention_eval attention_glove_eval \
	bert_att_eval clean printy test bench

printy:
	echo "Specify command please"

attention:
	export NLTK_DATA='nltk_data' ; $(PY) train.py 'basic_att' --model 'attention' --batch_size 16 --epochs 1 --max_caption_length -1 --workers 80

baseline:
	$(PY) train.py 'basic_baseline' --model 'baseline' --batch_size 32 --epochs 1 --max_caption_length -1 --workers 32

attention_glove:
	$(PY) train.py 'glove_att' --model 'attention' --batch_size 32 --epochs 4 --use_glove True --fine_tune_embedding True --embed_size 300 --checkpoint 'glove_att_1.pth.tar' --max_caption_length -1 --workers 32

baseline_glove:
	$(PY) train.py 'glove_baseline' --model 'baseline' --batch_size 32 --epochs 1 --use_glove True --fine_tune_embedding True --embed_size 300 --max_caption_length -1 --workers 32

attention_bert:
	$(PY) train.py 'bert_attention' --model 'attention' --batch_size 32 --epochs 4 --use_bert True --fine_tune_embedding True --embed_size 768 --checkpoint 'bert_attention_2.pth.tar' --max_caption_length -1 --workers 32

baseline_eval:
	$(PY) eval.py 'baseline_3.pth.tar' --model_type 'baseline'

baseline_glove_eval:
	$(PY) eval.py 'glove_baseline_3.pth.tar' --model_type 'baseline'

attention_eval:
	$(PY) eval.py 'basic_att_3.pth.tar' --model_type 'attention'

attention_glove_eval:
	$(PY) eval.py 'glove_att_3.pth.tar' --model_type 'attention'

bert_att_eval:
	$(PY) eval.py 'bert_attention_3.pth.tar' --model_type 'attention'

clean:
	rm -f slurm-*

# Repo-only convenience targets (not in the reference).
test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
