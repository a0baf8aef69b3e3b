# Published training configs (mirrors the reference Makefile:6-34, which
# wrapped these in slurm jobs; here they run directly on the TPU host).

PY ?= python

attention:
	$(PY) train.py basic_att --model attention --epochs 4 --workers 16 --batch_size 32 --max_caption_length 50

baseline:
	$(PY) train.py baseline --model baseline --epochs 4 --workers 16 --batch_size 32 --max_caption_length 50

attention_glove:
	$(PY) train.py glove_att --model attention --epochs 4 --workers 16 --batch_size 32 --max_caption_length 50 --use_glove 1 --embed_size 300

baseline_glove:
	$(PY) train.py glove_baseline --model baseline --epochs 4 --workers 16 --batch_size 32 --max_caption_length 50 --use_glove 1 --embed_size 300

attention_bert:
	$(PY) train.py bert_attention --model attention --epochs 4 --workers 16 --batch_size 32 --max_caption_length 50 --use_bert 1 --embed_size 768

attention_eval:
	$(PY) eval.py basic_att_3.ckpt --model_type attention --max_caption_length 50

baseline_eval:
	$(PY) eval.py baseline_3.ckpt --model_type baseline --max_caption_length 50

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

.PHONY: attention baseline attention_glove baseline_glove attention_bert attention_eval baseline_eval test bench
