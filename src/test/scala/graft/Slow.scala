package graft

/** Tag for the scale-smoke suite — excluded from the default test run
  * (build.sbt `-l graft.SlowTag`); run explicitly with
  * `sbt -batch "set Test/testOptions := Seq()"
  *  "testOnly graft.ops.ScaleSmokeSpec"`. */
object Slow extends org.scalatest.Tag("graft.SlowTag")
