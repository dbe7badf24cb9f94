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
