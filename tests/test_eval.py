"""Eval harness: judge-review scoring pipeline + QA option parsing."""

from gpt4roi_tpu.eval.gpt_review import (
    build_review_content,
    parse_score,
    review_answers,
    summarize,
)
from gpt4roi_tpu.eval.qa_score import parse_multiple_choice, score_answers


def test_parse_score():
    assert parse_score("8 7\nGood answers.") == [8.0, 7.0]
    assert parse_score("8, 7\nok") == [8.0, 7.0]
    assert parse_score("garbage") == [-1.0, -1.0]


def test_review_pipeline():
    questions = [{"question_id": 1, "text": "what is in region1?", "category": "detail"}]
    a1 = [{"text": "a cat"}]
    a2 = [{"text": "a dog"}]
    rules = {"detail": {"prompt": "Rate both 1-10. First line: two scores."},
             "default": {"prompt": "Rate."}}

    def judge(content, max_tokens):
        assert "[Question]" in content and "[Assistant 2]" in content
        return "9 4\nAssistant 1 was more accurate."

    reviews = review_answers(questions, a1, a2, rules, judge)
    assert reviews[0]["tuple"] == [9.0, 4.0]
    s = summarize(reviews)
    assert s["detail"] == (9.0, 4.0)


def test_review_content_with_context():
    c = build_review_content(
        {"text": "q"}, {"text": "x"}, {"text": "y"},
        {"prompt": "rule"}, {"caption": "two dogs", "boxes": [[1, 2, 3, 4]]},
    )
    assert "[Context]" in c and "two dogs" in c and "[1, 2, 3, 4]" in c


def test_mc_parsing():
    choices = ["red apple", "blue car", "green tree"]
    assert parse_multiple_choice("The answer is B.", choices) == 1
    assert parse_multiple_choice("(C) because...", choices) == 2
    assert parse_multiple_choice("I see a blue car here", choices) == 1
    assert parse_multiple_choice("no idea", choices) is None


def test_score_answers():
    answers = [
        {"question_id": "1", "text": "The answer is A"},
        {"question_id": "2", "text": "The answer is B"},
    ]
    gts = {
        "1": {"answer": 0, "choices": ["x", "y"]},
        "2": {"answer": 0, "choices": ["x", "y"]},
    }
    s = score_answers(answers, gts)
    assert s["total"] == 2 and s["accuracy"] == 0.5


def test_default_rules_bundled():
    """Bundled rule table (VERDICT r1 item 9): visual categories present,
    prompts usable by the review pipeline end to end."""
    from gpt4roi_tpu.eval.gpt_review import default_rules

    rules = default_rules()
    for cat in ["default", "conv", "detail", "complex", "coding", "math"]:
        assert cat in rules and rules[cat]["prompt"]
    # visual categories share the visual judge prompt
    assert "the user question displayed above" in rules["conv"]["prompt"]
    assert rules["conv"]["prompt"] == rules["detail"]["prompt"]

    def judge(content, max_tokens):
        return "7 8\nok."

    reviews = review_answers(
        [{"question_id": 1, "text": "q", "category": "conv"}],
        [{"text": "a"}], [{"text": "b"}], rules, judge,
    )
    assert reviews[0]["tuple"] == [7.0, 8.0]


def test_science_qa_end_to_end(tmp_path):
    """ScienceQA scorer (VERDICT r1 item 9) over a synthetic release
    layout, via the module CLI entry."""
    import json

    from gpt4roi_tpu.eval.science_qa import extract_answer, main, score_sciqa

    assert extract_answer("Blah. The answer is B.") == "B"
    assert extract_answer("The answer is maybe B") == "FAILED"
    assert extract_answer("The answer is A. The answer is B.") == "FAILED"

    problems = {
        "p1": {"choices": ["red", "blue"], "answer": 1},
        "p2": {"choices": ["one", "two", "three"], "answer": 0},
        "p3": {"choices": ["x", "y"], "answer": 0},
    }
    preds = [
        {"question_id": "p1", "prompt": "<image> color?", "text": "The answer is B."},
        {"question_id": "p2", "prompt": "count?", "text": "The answer is A."},
        {"question_id": "p3", "prompt": "pick", "text": "unparseable"},  # random fallback
    ]
    base = tmp_path / "sqa"
    base.mkdir()
    json.dump(problems, open(base / "problems.json", "w"))
    json.dump({"test": ["p1", "p2", "p3"]}, open(base / "pid_splits.json", "w"))
    rf = tmp_path / "preds.jsonl"
    rf.write_text("\n".join(json.dumps(p) for p in preds))

    out = score_sciqa(problems, ["p1", "p2", "p3"], {str(p["question_id"]): p for p in preds}, seed=0)
    sqa = out["sqa_results"]
    assert sqa["count"] == 3 and sqa["correct"] >= 2  # p1+p2 always right
    assert out["results"]["correct"][0]["is_multimodal"] is True

    main([
        "--base-dir", str(base), "--result-file", str(rf),
        "--output-file", str(tmp_path / "o.json"),
        "--output-result", str(tmp_path / "r.json"), "--seed", "0",
    ])
    saved = json.load(open(tmp_path / "r.json"))
    assert saved["count"] == 3


def test_web_report_records(tmp_path):
    from gpt4roi_tpu.eval.web_report import build_records, read_jsonl, write_report

    questions = {1: {"text": "what?", "category": "conv"}}
    a1 = {1: {"text": "cat"}}
    a2 = {1: {"text": "dog"}}
    reviews = {1: {"review": "9 4\nFirst was better.", "tuple": [9.0, 4.0]}}
    recs = build_records(questions, a1, a2, reviews, "ours", "vicuna")
    assert recs[0]["scores"] == [9.0, 4.0]
    assert recs[0]["explanation"] == "First was better."
    assert recs[0]["answers"]["ours"] == "cat"
    out = tmp_path / "report.json"
    write_report(recs, str(out), ["ours", "vicuna"])
    import json

    assert json.load(open(out))["models"] == ["ours", "vicuna"]
